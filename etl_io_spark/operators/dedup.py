"""Deduplication operators (north-star extension; BASELINE.json).

Four families, each with a distinct scale profile:

  * exact        — hash-groupBy on content: one shuffle keyed by the text
                   (or its 60-bit hash at 100 TB so the shuffle carries 8
                   bytes per doc, not documents).
  * n-gram Jaccard — shingle inverted index self-join: exact pairwise
                   similarity, pruned by dropping ubiquitous shingles
                   (stop-shingles are pure skew: a shingle in f docs makes
                   f² join rows).
  * MinHash+LSH  — signatures then band-bucket join: candidate pairs in
                   ~O(n·bands) instead of O(n²); the standard 100 TB path.
  * SimHash      — 60-bit bit-majority signature; near-dups share bands of
                   signature bits.

Everything is expression-level (no UDFs) and bottoms out in md5-derived
hashes, so DuckDB oracles replicate results bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from etl_io_spark.operators.text import hash60, tokens, word_ngrams

#: MinHash permutation parameters: h_j(x) = (A_j * x + B_j) mod P.
#: P is the largest prime < 2^31 so A*x stays well inside int64
#: (A < 2^31, x < 2^31 after folding h mod P).
MINHASH_P = 2_147_483_647


def _perm_a(j: int) -> int:
    return 2 * j + 1


def _perm_b(j: int) -> int:
    return (j * 40_503 + 11_027) % MINHASH_P


def exact_dedup(
    df: DataFrame, id_col: str, content_col: str, by_hash: bool = False
) -> DataFrame:
    """Exact dedup: one representative (min id) per distinct content, with
    the duplicate count. ``by_hash=True`` groups by the 60-bit content hash
    instead of the raw text — at 100 TB the shuffle then moves 8-byte keys.
    """
    key = hash60(content_col) if by_hash else F.col(content_col)
    return (
        df.groupBy(key.alias("content_key"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def shingle_sets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Distinct (id, shingle_hash) pairs — the inverted-index input for
    Jaccard and MinHash. ``max_doc_freq`` drops shingles appearing in more
    than that many docs (skew + signal: ubiquitous shingles carry no
    dedup information but quadratic join cost)."""
    sh = (
        df.select(F.col(id_col), F.explode(word_ngrams(text_col, n)).alias("sh"))
        .select(id_col, hash60(F.col("sh")).alias("sh"))
        .distinct()
    )
    if max_doc_freq is not None:
        freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
        keep = freq.where(F.col("df") <= max_doc_freq).select("sh")
        sh = sh.join(keep, "sh", "left_semi")
    return sh


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs above ``threshold``.

    Inverted-index plan: distinct shingles → self-equi-join on shingle →
    pair intersection counts → |A|+|B| from per-doc sizes → filter.
    The only shuffles are keyed by shingle hash and by (a, b) pair — no
    cross join anywhere, so cost tracks shared-shingle pairs, not n².
    """
    sh = shingle_sets(df, id_col, text_col, n).cache()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("a"), "sh")
    b = sh.select(F.col(id_col).alias("b"), "sh")
    inter = (
        a.join(b, "sh")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("a"), F.col("sz").alias("sz_a")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("sz").alias("sz_b")), "b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )
    return out


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    n: int = 3,
) -> DataFrame:
    """MinHash signatures: for each permutation j, min over the doc's
    shingle hashes of (A_j·x + B_j) mod P.

    One explode (shingles × num_perm) feeds a single partial-aggregating
    groupBy — the shuffle carries num_perm longs per doc. Output:
    (id, j, minhash)."""
    sh = shingle_sets(df, id_col, text_col, n)
    perms = F.array(*[F.lit(j) for j in range(num_perm)])
    x = F.pmod(F.col("sh"), F.lit(MINHASH_P))
    exploded = sh.select(
        id_col, x.alias("x"), F.explode(perms).alias("j")
    )
    a = F.element_at(
        F.array(*[F.lit(_perm_a(j)) for j in range(num_perm)]), F.col("j") + 1
    )
    b = F.element_at(
        F.array(*[F.lit(_perm_b(j)) for j in range(num_perm)]), F.col("j") + 1
    )
    hashed = exploded.withColumn(
        "h", F.pmod(a * F.col("x") + b, F.lit(MINHASH_P))
    )
    return hashed.groupBy(id_col, "j").agg(F.min("h").alias("minhash"))


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """LSH banding: docs sharing any band of the MinHash signature become
    candidate pairs, with the signature-agreement fraction (the MinHash
    estimate of Jaccard) attached.

    Plan: signatures → band key = md5 of the ordered in-band minhashes →
    self-join per (band, key) bucket → distinct pairs → rejoin signatures
    once to score agreement. Bucket join replaces the O(n²) cross join —
    the 100 TB dedup path."""
    rows_per_band = num_perm // bands
    sig = minhash_signatures(df, id_col, text_col, num_perm, n).cache()
    banded = sig.withColumn(
        "band", F.floor(F.col("j") / rows_per_band).cast("int")
    )
    # band key = md5 of the in-band minhashes in j-order (portable string
    # form: "v0,v1,..." — reproducible in any engine)
    band_key = banded.groupBy(id_col, "band").agg(
        F.md5(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "minhash"))),
                    lambda s: s["minhash"].cast("string"),
                ),
            )
        ).alias("bkey")
    )
    a = band_key.select(F.col(id_col).alias("a"), "band", "bkey")
    b = band_key.select(F.col(id_col).alias("b"), "band", "bkey")
    cand = (
        a.join(b, ["band", "bkey"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    sa = sig.select(F.col(id_col).alias("a"), "j", F.col("minhash").alias("ma"))
    sb = sig.select(F.col(id_col).alias("b"), "j", F.col("minhash").alias("mb"))
    scored = (
        cand.join(sa, "a")
        .join(sb, ["b", "j"])
        .groupBy("a", "b")
        .agg(
            F.round(
                F.sum(F.when(F.col("ma") == F.col("mb"), 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("est_jaccard")
        )
    )
    return scored


def simhash(
    df: DataFrame, id_col: str, text_col: str, bits: int = 32
) -> DataFrame:
    """SimHash signature: bit b of the output is the majority vote of bit b
    across the doc's token hashes. Computed as ``bits`` conditional sums in
    ONE aggregate pass (no per-bit explode): the shuffle carries ``bits``
    ints per doc. Near-dup docs differ in few bits (small Hamming distance).
    """
    tok = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("t")
    ).withColumn("h", hash60(F.col("t")))
    votes = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
            ).alias(f"b{b}")
            for b in range(bits)
        ]
    )
    sig: Column = F.lit(0).cast("bigint")
    for b in range(bits):
        sig = sig + F.when(F.col(f"b{b}") >= 0, F.lit(2**b)).otherwise(F.lit(0))
    return votes.select(F.col(id_col), sig.alias("simhash"))


def hamming_distance(a: Column, b: Column) -> Column:
    """Hamming distance between two int64 signatures (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))

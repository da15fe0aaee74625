"""Text-analysis operators over document tables (north-star extension;
BASELINE.json). All pure Catalyst expressions — no Python UDFs — so they
run inside whole-stage codegen and scale linearly with input splits.

Cross-engine determinism: every hash bottoms out in ``md5`` (bit-identical
everywhere) folded to a 60-bit integer, so DuckDB oracles can reproduce
results exactly:

  Spark :  CAST(CONV(SUBSTRING(md5(s),1,15),16,10) AS BIGINT)
  DuckDB:  CAST(('0x' || substring(md5(s),1,15)) AS BIGINT)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from etl_io_spark.caching import persist_tracked

from etl_io_spark.functions.numeric import round_floor, round_pz
from etl_io_spark.partitioning import spread

#: compressed-bytes-per-partition floor for text maps. Parquet zstd
#: compresses prose ~5-10x AND the regex/shingle maps here cost ~100x the
#: scan per byte, so the generic 8 MiB floor (partitioning.py) leaves
#: text scans single-task until ~tens of MiB compressed — measured 2.8 s
#: -> 0.6 s on the sf0.1 langid confusion query once spread engages. At
#: cluster scale the scan already has >= core-count splits and spread
#: stays a no-op (it never shrinks).
TEXT_MIN_BYTES_PER_PARTITION = 32 * 1024


def spread_text(df: DataFrame) -> DataFrame:
    """``spread`` tuned for CPU-heavy text maps (regex, shingling, md5):
    engages at ~32 KiB compressed per partition instead of 8 MiB."""
    return spread(df, min_bytes_per_partition=TEXT_MIN_BYTES_PER_PARTITION)


#: 60-bit md5-derived hash (SQL text, shared by dedup/similarity oracles)
HASH60_SPARK = "CAST(CONV(SUBSTRING(md5({s}),1,15),16,10) AS BIGINT)"
HASH60_DUCK = "CAST(('0x' || substring(md5({s}),1,15)) AS BIGINT)"

#: polynomial rolling-hash modulus — small enough that acc*31+255 never
#: overflows int64 in either engine (31 * 1e15 << 2^63).
ROLLING_MOD = 1_000_000_000_000_037


def hash60(col: Column | str) -> Column:
    """60-bit deterministic content hash of a string column/expression."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def tokens(col: str) -> Column:
    """Whitespace tokenization: array of non-empty tokens.

    The split class is EXPLICIT ``[ \\t\\n\\f\\r]`` — RE2's ``\\s`` —
    not Java's ``\\s`` (which also includes ``\\x0B``): every DuckDB
    oracle tokenizes with RE2, and a vertical tab in the data would
    otherwise split a token on one engine only (round-10 review catch;
    pinned by the adversarial corpus's ``\\x0B`` row)."""
    return F.filter(
        F.split(F.trim(F.col(col)), "[ \t\n\f\r]+"), lambda t: t != F.lit("")
    )


def word_ngrams(col: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles (array<string>); the MinHash/Jaccard unit.

    Built from ``sequence`` + per-position ``element_at`` — measured ~10×
    cheaper than a ``slice``-per-shingle formulation (slice allocates a
    sub-array per shingle; element_at reads in place). Docs shorter than
    ``n`` words produce an empty array. Pass an already-tokenized array
    column to avoid re-splitting (see ``shingle_sets``).
    """
    toks = tokens(col) if isinstance(col, str) else col
    return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + k + 1) for k in range(n)]
            ),
        )
    )


def token_count_ws(col: str) -> Column:
    """Whitespace token count: ``regexp_count`` of non-whitespace RUNS —
    the same number as ``size(tokens(col))`` for every string (maximal
    ``\\S+`` runs ARE the non-empty split tokens; verified exhaustively
    over the 500k-doc 100x corpus, 0 mismatches) without materializing a
    token array just to take its length. Round-9 A/B at 500k docs:
    0.68 -> 0.53 s as a lone aggregate; compounds inside
    ``quality_score_expr`` where the split previously ran twice. Keep
    ``tokens()`` where the ARRAY itself is consumed.

    NULL text counts as NULL (standard SQL null propagation) — the old
    split form returned the legacy ``size(NULL) = -1`` sentinel under
    non-ANSI mode, which no consumer wanted: a -1 "count" silently
    shifted ``pack_sequences``'s running token sums. Null-text rows now
    fall out of token accounting instead (pinned by test)."""
    return F.regexp_count(F.col(col), F.lit("[^ \t\n\f\r]+"))


#: BPE-ish unit: runs of letters, runs of digits, or single other glyphs —
#: a cheap deterministic proxy for subword token counting.
BPE_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def token_count_bpe(col: str) -> Column:
    """Count of BPE-ish units (letters-run | digits-run | symbol).

    The three alternatives of :data:`BPE_PATTERN` match DISJOINT
    character classes, so the count decomposes exactly:
    ``count([a-zA-Z]+) + count([0-9]+) + count of other non-ws glyphs``
    — two simple-class run scans plus a ``translate`` deletion count
    (the :func:`punct_ratio` trick), sidestepping Java regex's
    per-position alternation trial. Round-10 A/B at the 100x corpus
    (500k docs, exhaustive equality: 0 mismatches): 3.86 -> 1.00 s as a
    lone aggregate vs the single alternation ``regexp_count`` (which
    itself beat ``size(regexp_extract_all(...))`` 7.1 -> 4.5 s in r8).
    NULL text stays NULL-in → NULL-out (all three terms null-propagate).
    The DuckDB oracles keep the one-regex form — RE2 has no alternation
    cliff, and mirroring a 68-char translate set in SQL would obscure
    them for no parity gain."""
    return (
        F.regexp_count(F.col(col), F.lit("[a-zA-Z]+"))
        + F.regexp_count(F.col(col), F.lit("[0-9]+"))
        + F.length(F.translate(F.col(col), _ALNUM_WS, ""))
    )


#: RE2's ``\s`` is exactly ``[ \t\n\f\r]`` — NOTE: narrower than Java's,
#: which also includes ``\x0B``. The engine standardizes on the RE2 set
#: (the DuckDB oracles' semantics); every Spark-side whitespace regex is
#: spelled as this explicit class, never ``\s`` (round-10).
_WS = " \t\n\f\r"

#: ``[a-zA-Z0-9\s]`` (RE2 ``\s``) as a literal charset — the
#: ``translate`` deletion set that counts punct without a regex pass.
_ALNUM_WS = (
    "abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789" + _WS
)


def punct_ratio(col: str) -> Column:
    """Non-alphanumeric-non-space glyphs / total chars.

    Round 8: counted by DELETING the allowed charset with ``translate``
    (single per-char map pass) instead of
    ``length - length(regexp_replace('[^a-zA-Z0-9\\s]', ''))`` —
    value-identical (checked exhaustively vs the regex form and
    oracle-green at both SFs), but ~9x faster at the 100x probe: Java's
    ``Matcher.appendReplacement`` pays per MATCH, and every punct glyph
    is a match, which made this single expression ~26 of
    corpus_datacard's 26.9 s at 500k docs (the DuckDB oracle keeps the
    regex form; RE2 does not have the per-match cliff)."""
    total = F.length(col)
    punct = F.length(F.translate(F.col(col), _ALNUM_WS, ""))
    return F.when(total > 0, punct / total).otherwise(F.lit(0.0))


#: tiny stopword list used by quality scoring + lang-id voting
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def stopword_ratio(col: str, stopwords: Sequence[str] = STOPWORDS) -> Column:
    """Stopword hits / token count. Hits counted with a word-boundary
    regexp (codegen'd; zero-width ``\\b`` identical in Java regex and RE2)
    instead of an interpreted array filter — equal counts on
    whitespace-tokenized text. (Round-8 A/B at the 100x probe: this
    ``regexp_count`` is CHEAP — 0.6 s over 500k docs — while a
    split-runs + higher-order-filter rewrite ran 31 s because array
    materialization + the interpreted lambda leave codegen; do not
    "optimize" it. The expensive expression in this battery was
    punct_ratio's regexp_replace, fixed separately.)"""
    n = token_count_ws(col)
    sw = F.regexp_count(
        F.col(col), F.lit(r"\b(" + "|".join(stopwords) + r")\b")
    )
    return F.when(n > 0, sw / n).otherwise(F.lit(0.0))


def quality_score_expr(text_col: str) -> Column:
    """Composite per-document quality score (unrounded): the gate battery
    shared by :func:`quality_features` and :func:`corpus_datacard` —
    length band + stopword presence + punctuation ceiling."""
    n_words = token_count_ws(text_col)
    return (
        F.when((n_words >= 20) & (n_words <= 1000), F.lit(0.4)).otherwise(F.lit(0.0))
        + F.when(stopword_ratio(text_col) >= 0.05, F.lit(0.3)).otherwise(F.lit(0.0))
        + F.when(punct_ratio(text_col) <= 0.1, F.lit(0.3)).otherwise(F.lit(0.0))
    )


def quality_features(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document quality features + composite score (rounded for oracle
    parity). Mirrors common LLM-data quality gates: length, mean word
    length, punctuation density, stopword density."""
    # token_count_ws, not size(tokens(...)): non-ANSI size(NULL) is -1,
    # which leaked a -1 "word count" for NULL text where the oracle says
    # NULL (round-10 adversarial-corpus catch; NULL-in → NULL-out is the
    # pinned contract)
    n_words = token_count_ws(text_col)
    # Σ token lengths == chars excluding whitespace (tokens are exactly the
    # maximal non-whitespace runs) — translate-deletion of the \s charset
    # (regexp_replace pays Matcher.appendReplacement per match; see
    # punct_ratio) instead of an interpreted transform+aggregate walk of
    # the token array.
    sum_tok_len = F.length(F.translate(F.col(text_col), _WS, ""))
    mean_wlen = F.when(
        n_words > 0, sum_tok_len.cast("double") / n_words
    ).otherwise(F.lit(0.0))
    score = quality_score_expr(text_col)
    # spread_text (r12-opt): per-doc feature battery, map-only output —
    # no shuffle follows, so the finer split floor is pure parallelism
    # (interleaved A/B at sf0.1: 0.44 -> 0.23 s median of 5)
    return spread_text(df).select(
        F.col(id_col),
        # bigint, matching SQL engines' LENGTH/len types — keeps the
        # compared schema drift-free for type-aware value hashing
        F.length(text_col).cast("bigint").alias("n_chars"),
        n_words.cast("bigint").alias("n_words"),
        # floor-form for the int/int ratios (terminating-decimal ROUND
        # class — round-10); quality_score keeps ROUND: its values are
        # sums of {0, 0.3, 0.4}, never near a rounding boundary
        round_floor(mean_wlen, 4).alias("mean_word_len"),
        round_floor(punct_ratio(text_col), 4).alias("punct_ratio"),
        round_floor(stopword_ratio(text_col), 4).alias("stopword_ratio"),
        F.round(score, 2).alias("quality_score"),
    )


#: language marker dictionaries for the n-gram-free voting heuristic.
#: (The driver's synthetic corpus shares one vocabulary across langs, so
#: this is graded on determinism/parity, not linguistic accuracy.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "los", "que", "una", "por"),
}


def lang_id_exprs(text_col: str) -> tuple[Column, Column]:
    """Column expressions ``(lang_score, lang_pred)`` of the marker-word
    voting classifier over ``text_col`` — the composable core of
    :func:`lang_id`, so evaluation queries (confusion matrix, P/R/F1) can
    attach the prediction inline in the SAME select as other columns:
    one scan of the corpus, zero self-joins.

    Hits are found with ONE ``regexp_extract_all`` pass over the text — a
    word-boundary alternation of every marker across every language (the
    marker sets are disjoint, and zero-width ``\\b`` behaves identically
    in Java regex and RE2) — then attributed to languages by filtering the
    small hit array. The regex scan is the data-proportional cost and it
    runs once instead of once per language; the per-language array filters
    are interpreted but walk only the few extracted hits, not the text
    (~1.6x faster than per-language ``regexp_count`` measured at sf0.1).
    On whitespace-tokenized text the counts equal per-language
    ``regexp_count``, so the DuckDB oracle is unchanged."""
    toks = tokens(text_col)
    n = F.size(toks)
    all_words = [w for words in LANG_MARKERS.values() for w in words]
    hits = F.regexp_extract_all(
        F.col(text_col), F.lit(r"\b(" + "|".join(all_words) + r")\b"), F.lit(1)
    )
    scores = {
        lang: F.when(
            n > 0,
            F.size(F.filter(hits, lambda t: t.isin(*words))) / n,
        ).otherwise(F.lit(0.0))
        for lang, words in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    # reversed so earlier (lexicographically smaller) languages win ties
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return F.round(best, 4), pred


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word voting language ID: score per language = marker-word
    hits / token count; prediction = argmax with deterministic
    lexicographic tiebreak, 'und' (undetermined) when no marker hits.
    See :func:`lang_id_exprs` for the single-regex-pass mechanics."""
    score, pred = lang_id_exprs(text_col)
    # spread_text, not bare spread: the regex alternation costs ~0.5 ms/doc
    # single-task; the round-2 "repartition costs more" measurement was an
    # artifact of re-collecting the same DataFrame (shuffle-stage reuse).
    # Fresh-plan wall at sf0.1: 2.8 s single-task -> 0.6 s spread.
    return spread_text(df).select(
        F.col(id_col),
        score.alias("lang_score"),
        pred.alias("lang_pred"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprints: full md5 hex + 60-bit int + polynomial
    rolling hash over character codes (mod ROLLING_MOD).

    The rolling hash is the reference primitive for shift-resistant
    fingerprinting; computed with ``aggregate`` over the char array —
    sequential, deterministic, identical in DuckDB via list_reduce."""
    chars = F.expr(f"transform(split({text_col}, ''), x -> ascii(x))")
    rolling = F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * 31 + x) % F.lit(ROLLING_MOD),
    )
    return spread_text(df).select(
        F.col(id_col),
        F.md5(text_col).alias("md5_hex"),
        F.expr(HASH60_SPARK.format(s=text_col)).alias("hash60"),
        rolling.alias("rolling_hash"),
    )


def tf_idf_top_terms(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Top-``k`` terms per document by smoothed TF-IDF — the classic
    keyword-extraction / feature-weighting primitive, as three shuffles of
    pure built-in aggregates (no ml.feature, no UDFs):

      tf(d, t)  = occurrences of t in d            (groupBy doc, term)
      idf(t)    = ln((N + 1) / (df_t + 1)) + 1     (groupBy term, N = docs)
      score     = tf * idf, round 6

    Term df comes from a second aggregate over the (doc, term) counts —
    already one row per (doc, term), so the idf pass shuffles the
    vocabulary-size table, not the corpus. The doc count N is a scalar
    broadcast into the idf expression via a cross join of a 1-row
    aggregate (Catalyst plans a broadcast nested loop of one row — no
    collect, no driver round-trip). Ties break on term ascending for
    cross-engine determinism.
    """
    from pyspark.sql import Window

    toked = spread(df).select(
        F.col(id_col), F.explode(tokens(text_col)).alias("term")
    )
    tf = toked.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(
        F.countDistinct(id_col).alias("__n")
    )  # 1-row, broadcast below
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            (F.log((F.col("__n") + 1) / (F.col("df") + 1)) + 1).alias("idf"),
        )
    )
    scored = tf.join(idf, "term").select(
        id_col,
        "term",
        F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tfidf", "rank")
    )


def vocab_top_tokens(
    df: DataFrame,
    text_col: str,
    k: int = 100,
    min_count: int = 1,
) -> DataFrame:
    """Corpus vocabulary construction: exact token frequencies, top-``k``
    by count with lexicographic tiebreak, ranked. The first step of any
    tokenizer/vocab build and the exact heavy-hitters baseline the
    sketch variants are judged against.

    One explode + one partial-aggregating groupBy: the shuffle carries
    (token, partial count) pairs — vocabulary-size, not corpus-size —
    then a distributed TakeOrderedAndProject picks the top-k (per-
    partition heaps, no global sort). At 100 TB this is the canonical
    map-side-combine wordcount; no driver collection anywhere."""
    from pyspark.sql import Window

    counts = (
        spread(df)
        .select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= min_count)
    )
    w_rank = Window.orderBy(F.col("cnt").desc(), F.col("token"))
    return (
        counts.orderBy(F.col("cnt").desc(), "token")
        .limit(k)
        .withColumn("rank", F.row_number().over(w_rank).cast("int"))
    )


def contamination(
    df: DataFrame,
    bench_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Benchmark decontamination: per-document word n-gram overlap against
    a benchmark/eval set — the standard training-data hygiene check (flag
    documents whose n-grams leak evaluation data).

    The benchmark's distinct n-gram set is tiny relative to the corpus, so
    it is **broadcast**: the corpus side explodes its n-grams map-side
    (``explode_outer`` keeps zero-gram docs), hits are marked by a
    broadcast left join (no shuffle), and one partial-aggregating
    ``groupBy(id)`` produces totals — the only corpus-proportional shuffle
    carries at most one row per (doc, partition). At 100 TB the benchmark
    set is still MBs, so the plan shape is unchanged; skewless because the
    key is the doc id. ``contaminated`` uses exact integer arithmetic
    (matched*10 >= total, i.e. ≥10% overlap) — no float threshold edge.
    """
    # tokenize into a real column BEFORE shingling: word_ngrams references
    # its token array once per element inside the transform lambda, so an
    # inline split expression would re-tokenize the text per shingle
    # (quadratic in doc length; measured 14x slower at sf0.1)
    bench_grams = (
        bench_df.select(
            tokens(bench_text_col or text_col).alias("__btoks")
        )
        .select(F.explode(word_ngrams(F.col("__btoks"), n)).alias("__g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    exploded = (
        # spread_text (r12-opt): shingling dominates and the join output
        # is doc-grain (A/B at sf0.1: 1.20 -> 0.83 s median of 5)
        spread_text(df)
        .select(F.col(id_col), tokens(text_col).alias("__toks"))
        .select(
            F.col(id_col),
            F.explode_outer(word_ngrams(F.col("__toks"), n)).alias("__g"),
        )
    )
    return (
        exploded.join(F.broadcast(bench_grams), "__g", "left")
        .groupBy(id_col)
        .agg(
            F.count("__g").alias("n_ngrams"),
            F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_matched"),
        )
        .select(
            id_col,
            "n_ngrams",
            "n_matched",
            F.round(
                F.when(
                    F.col("n_ngrams") > 0,
                    F.col("n_matched") / F.col("n_ngrams"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("contamination"),
            (F.col("n_matched") * 10 >= F.col("n_ngrams")).alias(
                "contaminated"
            ),
        )
    )


def repetition_features(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Gopher-style within-document repetition signals: the fraction of
    duplicate words / bigrams / trigrams (``1 - distinct/total``). High
    values indicate boilerplate or degenerate generations — a core
    training-data quality filter.

    Entirely map-side (array ops inside whole-stage codegen: no explode,
    no shuffle, no UDF) — at 100 TB this is a pure scan whose cost is one
    pass over the tokens, and it composes with any downstream filter
    before data ever moves. The n-gram arrays are built per-row and never
    retained across rows (cf. the explode/array-retention trap — none
    here, there is no generator at all)."""

    def dup_frac(arr: Column) -> Column:
        n = F.size(arr)
        # floor-form: 1 - distinct/n is an int/int ratio and terminates
        # at the 6th decimal whenever n divides a power of 10 (the
        # cross-engine ROUND class — round-10)
        return round_floor(
            F.when(
                n > 0,
                1.0 - F.size(F.array_distinct(arr)) / n.cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        )

    # tokenize (and build each n-gram array) as real columns in separate
    # projections: referencing an inline split expression from inside the
    # n-gram transform lambda re-splits the text per element (quadratic in
    # doc length — measured 14x slower at sf0.1). Catalyst keeps the
    # stages separate because the aliases are non-cheap and multiply
    # referenced.
    toked = spread_text(df).select(F.col(id_col), tokens(text_col).alias("__toks"))
    grams = toked.withColumn(
        "__bi", word_ngrams(F.col("__toks"), 2)
    ).withColumn("__tri", word_ngrams(F.col("__toks"), 3))
    return grams.select(
        F.col(id_col),
        # NULL-safe count: size(NULL) is -1 under non-ANSI (round-10)
        F.when(F.col("__toks").isNotNull(), F.size("__toks")).alias(
            "n_words"
        ),
        dup_frac(F.col("__toks")).alias("dup_word_frac"),
        dup_frac(F.col("__bi")).alias("dup_bigram_frac"),
        dup_frac(F.col("__tri")).alias("dup_trigram_frac"),
    )


def pmi_collocations(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_count: int = 5,
    k: int = 50,
) -> DataFrame:
    """Top-``k`` bigram collocations by pointwise mutual information —
    corpus-level phrase discovery (the "New York" detector):

      pmi(w1, w2) = ln( (c12 / B) / ((c1 / B) * (c2 / B)) )

    with ``B`` = total bigram occurrences, ``c1``/``c2`` counted over
    bigram SLOTS (left + right occurrences) so every probability shares
    the same denominator. Bigrams are emitted map-side from the token
    array (one generator, no self-join: zip_with over the array and its
    tail), then one groupBy counts them; unigram slot counts reuse those
    bigram counts (vocabulary-size input, not corpus-size). ``min_count``
    drops noise pairs, ties break lexicographically. The only
    corpus-proportional shuffle is the bigram count itself.
    """
    from pyspark.sql import Window

    toks = F.col("__toks")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = (
        spread_text(df)
        # tokenize once into a column: the bigram expression references the
        # token array four times (two slices + two sizes)
        .select(tokens(text_col).alias("__toks"))
        .select(F.explode(bigrams).alias("__b"))
        .select("__b.w1", "__b.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .transform(persist_tracked)  # feeds the totals, both marginals, and the join
    )
    tot = bg.agg(F.sum("c12").alias("total"))  # 1 row, broadcast below
    left = bg.groupBy(F.col("w1").alias("w")).agg(F.sum("c12").alias("cl"))
    right = bg.groupBy(F.col("w2").alias("w")).agg(F.sum("c12").alias("cr"))
    uni = (
        left.join(right, "w", "full")
        .select(
            "w",
            (
                F.coalesce("cl", F.lit(0)) + F.coalesce("cr", F.lit(0))
            ).alias("cw"),
        )
    )
    scored = (
        bg.where(F.col("c12") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("cw").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("cw").alias("c2")), "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            "c12",
            round_pz(
                F.log(
                    (F.col("c12") * F.col("total"))
                    / (F.col("c1").cast("double") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    # distributed top-k first (TakeOrderedAndProject — per-partition heaps,
    # no global sort), then rank the k survivors with a trivial window
    w = Window.orderBy(F.col("pmi").desc(), F.col("w1"), F.col("w2"))
    return (
        scored.orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .select("w1", "w2", "c12", "pmi", "rank")
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    k: int = 20,
    round_to: int = 4,
) -> DataFrame:
    """Full-corpus BM25 ranking for a literal query-term list: the
    classic lexical retrieval scorer (Robertson/Spärck Jones; the
    ``+1``-inside-the-log idf variant, so scores are always >= 0).

    Plan shape: one map pass computes per-doc length + per-term tf
    (codegen'd array ops, no explode — the query is a small literal so
    each term is its own column); one partial-aggregable global aggregate
    produces N / avgdl / per-term document frequencies (a single 1-row
    result, broadcast back via cross join); scoring is then pure map and
    the top-k plans as TakeOrderedAndProject. Two scans of nothing but
    (id, tokens): at 100 TB this is the cheapest exact formulation —
    no inverted index needed for a bounded query set.
    """
    toks = tokens(text_col)
    base = df.select(F.col(id_col), toks.alias("__toks")).withColumn(
        # NULL-safe doc length: size(NULL) = -1 would poison avgdl with
        # -1 entries for NULL-text docs (AVG skips NULL on both engines;
        # round-10 adversarial-corpus catch)
        "__dl",
        F.when(F.col("__toks").isNotNull(), F.size("__toks")),
    )
    def _eq(term: str):
        # a 1-arg lambda per term: a default-arg lambda would have arity 2
        # and F.filter would bind the element *index* to it
        return lambda x: x == F.lit(term)

    for i, t in enumerate(query_terms):
        base = base.withColumn(
            f"__tf{i}", F.size(F.filter(F.col("__toks"), _eq(t)))
        )
    base = base.drop("__toks")
    stats = base.agg(
        F.count(F.lit(1)).alias("__N"),
        F.avg("__dl").alias("__avgdl"),
        *[
            F.sum((F.col(f"__tf{i}") > 0).cast("long")).alias(f"__df{i}")
            for i in range(len(query_terms))
        ],
    )
    scored = base.join(F.broadcast(stats))
    score = None
    for i in range(len(query_terms)):
        tf = F.col(f"__tf{i}").cast("double")
        idf = F.log(
            (F.col("__N") - F.col(f"__df{i}") + 0.5)
            / (F.col(f"__df{i}") + 0.5)
            + 1.0
        )
        term = (idf * (tf * (k1 + 1))) / (
            tf + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))
        )
        score = term if score is None else score + term
    hit = None
    for i in range(len(query_terms)):
        h = F.col(f"__tf{i}") > 0
        hit = h if hit is None else hit | h
    return (
        scored.where(hit)
        .select(F.col(id_col), F.round(score, round_to).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(k)
    )


def oov_rate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 100,
) -> DataFrame:
    """Vocabulary-coverage scoring: per document, the fraction of tokens
    outside the corpus's ``vocab_size`` most-frequent tokens (count desc,
    token asc tie-break) — the gate that flags encoding junk, wrong-language
    and OCR noise before tokenizer training.

    Two stages sharing one tokenization: the vocab is an exact heavy-hitter
    count (map-side combine, TakeOrdered) folded into a ONE-ROW array
    relation that cross-joins in as a broadcast; the per-doc pass is then
    pure map (filter against the broadcast array) — the corpus is never
    joined row-to-row, and NOTHING executes at plan-construction time
    (round-6: the previous driver-side ``collect()`` of the vocab ran the
    heavy-hitter jobs during construction — outside bench.py's timed
    window and eagerly even when the caller never executes the plan)."""
    toks = tokens(text_col)
    vocab_arr = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "tok")
        .limit(vocab_size)
        .agg(F.collect_list("tok").alias("__vocab"))
    )
    # NULL-safe counts: size(NULL) is -1 under non-ANSI; NULL text must
    # report NULL counts, not -1 (round-10 adversarial-corpus catch)
    nn = F.col(text_col).isNotNull()
    n = F.when(nn, F.size(toks))
    n_oov = F.when(
        nn,
        F.size(
            F.filter(toks, lambda t: ~F.array_contains(F.col("__vocab"), t))
        ),
    )
    return (
        docs.crossJoin(F.broadcast(vocab_arr))
        .select(
            id_col,
            n.alias("n_tokens"),
            n_oov.alias("n_oov"),
            # two-branch when: empty text → 0.0, NULL text → NULL (an
            # `otherwise(0.0)` would swallow the NULL branch); floor-form
            # for the terminating int/int ratio (round-10)
            F.when(n > 0, round_floor(n_oov / n, 6))
            .when(n == 0, F.lit(0.0))
            .alias("oov_rate"),
        )
    )


def char_entropy(
    df: DataFrame,
    id_col: str,
    text_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-document Shannon entropy (bits/char) of the character
    distribution — a model-free quality/gibberish signal: natural prose
    sits ~4-4.5 bits, base64 blobs and key-mash near 6, template spam and
    repeated-char padding far below. Complements the token-level quality
    scores (same family as ``quality_scores``; entropy catches what
    token ratios can't — e.g. hex dumps are 100% "words").

    Shape: explode to (doc, char) pairs, count per pair, then fold with
    the one-pass algebra ``H = log2(n) - Σ c·log2(c) / n`` — two keyed
    aggregations, both partial-aggregable map-side (distinct chars per
    doc per partition is bounded by the alphabet, so the shuffle carries
    ~|alphabet| rows per doc regardless of document length). Documents
    with empty text yield no characters and are dropped (entropy of an
    empty string is undefined).
    """
    ln2 = F.lit(0.6931471805599453)
    ch = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "")).alias("__ch"),
    ).where(F.col("__ch") != "")  # split("") yields [""], not []
    counts = ch.groupBy(id_col, "__ch").agg(F.count(F.lit(1)).alias("__c"))
    n = F.sum("__c")
    return counts.groupBy(id_col).agg(
        n.cast("bigint").alias("n_chars_counted"),
        F.count(F.lit(1)).alias("distinct_chars"),
        F.round(
            (F.log(n) - F.sum(F.col("__c") * F.log("__c")) / n) / ln2,
            round_to,
        ).alias("entropy_bits"),
    )


def quote_spans(
    df: DataFrame,
    bench_df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> DataFrame:
    """Span-level contamination: WHERE a document quotes the benchmark,
    not just whether (``contamination`` flags documents; redaction and
    audit need positions). Every token position whose word n-gram
    appears in the benchmark set is a hit; consecutive hit positions
    merge into spans via the gaps-and-islands anchor, yielding
    ``(doc, span_start, span_end, n_grams)`` in token coordinates
    (1-based; a span's last covered token is ``span_end + n - 1``).

    Shape: positional n-grams are built in-row (transform over sequence
    — the struct is finished inside the generator), the benchmark's
    distinct gram-hash set BROADCASTS into a map-side semi-join, and the
    only keyed shuffle is the per-doc islands window over HIT positions
    (a sliver of the corpus by construction).
    """
    from pyspark.sql import Window as W

    def _grams(d: DataFrame, with_pos: bool) -> DataFrame:
        toked = spread_text(d).select(F.col(id_col), tokens(text_col).alias("__w"))
        structs = F.transform(
            F.sequence(
                F.lit(1),
                F.greatest(F.size("__w") - (n - 1), F.lit(0)),
            ),
            lambda s: F.struct(
                s.alias("pos"),
                F.array_join(F.slice("__w", s, n), " ").alias("g"),
            ),
        )
        out = toked.where(F.size("__w") >= n).select(
            F.col(id_col), F.explode(structs).alias("__e")
        )
        cols = [F.col("__e.pos").alias("pos")] if with_pos else []
        return out.select(id_col, *cols, hash60(F.col("__e.g")).alias("gh"))

    bench = _grams(bench_df, with_pos=False).select("gh").distinct()
    hits = _grams(df, with_pos=True).join(
        F.broadcast(bench), "gh", "left_semi"
    )
    w = W.partitionBy(id_col).orderBy("pos")
    anchored = hits.withColumn(
        "__anchor", F.col("pos") - F.row_number().over(w)
    )
    return anchored.groupBy(id_col, "__anchor").agg(
        F.min("pos").alias("span_start"),
        F.max("pos").alias("span_end"),
        F.count(F.lit(1)).alias("n_grams"),
    ).drop("__anchor")


def vocab_drift(
    df: DataFrame,
    group_col,
    text_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Distribution drift between two corpus slices (``group_col`` must
    be a boolean split): add-1-smoothed unigram distributions over the
    shared vocabulary, scored with both directed KL divergences and the
    bounded symmetric Jensen-Shannon divergence — the standard
    data-drift alarm between crawls/snapshots/domains.

    ONE token-count shuffle produces both distributions (conditional
    sums in the same aggregate); the divergence fold runs over the
    VOCABULARY table with single-row totals broadcast in-plan. Returns
    one row: vocab_size, n_tokens_a/b, kl_ab, kl_ba, js.
    """
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    tok = spread(df).select(
        g.alias("__a"), F.explode(tokens(text_col)).alias("__t")
    )
    counts = tok.groupBy("__t").agg(
        F.sum(F.when(F.col("__a"), 1).otherwise(0)).alias("__ca"),
        F.sum(F.when(F.col("__a"), 0).otherwise(1)).alias("__cb"),
    )
    tot = counts.agg(
        F.sum("__ca").alias("__ta"),
        F.sum("__cb").alias("__tb"),
        F.count(F.lit(1)).alias("__v"),
    )
    j = counts.crossJoin(F.broadcast(tot))
    p = (F.col("__ca") + 1) / (F.col("__ta") + F.col("__v"))
    q = (F.col("__cb") + 1) / (F.col("__tb") + F.col("__v"))
    m = (p + q) / 2
    return j.agg(
        F.max("__v").cast("bigint").alias("vocab_size"),
        F.max("__ta").cast("bigint").alias("n_tokens_a"),
        F.max("__tb").cast("bigint").alias("n_tokens_b"),
        F.round(F.sum(p * F.log(p / q)), round_to).alias("kl_ab"),
        F.round(F.sum(q * F.log(q / p)), round_to).alias("kl_ba"),
        F.round(
            F.lit(0.5) * F.sum(p * F.log(p / m))
            + F.lit(0.5) * F.sum(q * F.log(q / m)),
            round_to,
        ).alias("js"),
    )


def lm_cross_entropy(
    df: DataFrame,
    id_col: str,
    text_col: str,
    alpha: float = 0.4,
    round_to: int = 6,
    carry: tuple[str, ...] = (),
    broadcast_model: bool | None = None,
) -> DataFrame:
    """Per-document cross-entropy (nats/token) under an interpolated
    bigram language model trained on the corpus itself — the classic
    perplexity-proxy quality filter (KenLM-style gating without the
    external model): boilerplate and templated text score LOW (their
    bigrams are corpus-frequent), keyboard mash and OCR noise score HIGH.

      p(w2 | w1) = alpha * c(w1 w2) / c1(w1) + (1 - alpha) * c2(w2) / N

    with c1 counted over LEFT bigram slots and c2 over RIGHT slots, so
    both terms are proper conditionals over the same event space and the
    mixture never hits log(0) for in-corpus bigrams. Docs with < 2
    tokens have no bigrams and are absent from the output.

    Plan: one map-side bigram explode (zip_with over the token array and
    its tail — no self-join), one groupBy to count bigrams; the unigram
    slot counts are WINDOW sums over the bigram-count table (round 7 —
    ``sum(c12) over (partition by w1)`` / ``(partition by w2)``: two
    vocab-sized exchanges replacing the old derive-c1/derive-c2 plans
    plus their two join repartitions, and the bg persist those joins
    forced; interleaved A/B at sf0.1: 3.08 → 2.05 s median, identical
    integer sums so every score is bit-identical). The per-doc pass
    joins each bigram occurrence to the nll table — the
    corpus-proportional cost is the bigram explode + one keyed join,
    exactly the scan-shaped work any corpus LM scorer must do.

    ``carry`` threads extra per-document constant columns (e.g. a
    language tag) through to the output WITHOUT a post-hoc doc_id join:
    they ride the bigram rows and join the final group key — free,
    because they are functionally dependent on ``id_col``.

    Negative A/Bs (interleaved medians at sf0.1; do NOT retry):
    persisting the occurrence stream is a wash in BOTH the old shape
    (r6: 1.68 recompute vs 1.79 persisted) and the window shape (r7:
    2.05 vs 2.47 — both passes shuffle ``occ`` anyway, the cache saves
    only tokenize/explode while adding a materialization). Forcing a
    broadcast of the vocab-sized nll or c1/c2 tables: wash (r6 1.57 s)
    to 2x-worse (r7 broadcast-c1/c2 5.1 s — it needs the bg persist
    back). md5-int join keys (hash60 both engines): wash — the hashing
    CPU eats the fixed-width-shuffle savings. Co-partitioning occ by w2
    to reuse the second window's partitioning in the join: wash under
    AQE (it re-coalesces the two sides differently).
    """
    toks = F.col("__toks")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    carry_cols = [F.col(c) for c in carry]
    occ = (
        spread_text(df)
        .select(F.col(id_col), *carry_cols, tokens(text_col).alias("__toks"))
        .select(F.col(id_col), *carry_cols, F.explode(bigrams).alias("__b"))
        .select(
            id_col,
            *carry,
            F.col("__b.w1").alias("w1"),
            F.col("__b.w2").alias("w2"),
        )
    )
    from pyspark.sql import Window

    bg = occ.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    total = bg.agg(F.sum("c12").alias("__N"))
    p = (
        F.lit(alpha) * F.col("c12") / F.col("c1")
        + F.lit(1.0 - alpha) * F.col("c2") / F.col("__N")
    )
    # fold the mixture into a VOCAB-sized per-bigram NLL table: the slot
    # marginals are window sums OVER the bigram-count table (no separate
    # c1/c2 aggregate plans, no join repartitions, no bg persist — the
    # two bg consumers, window chain and total, share one physical
    # aggregate via ReuseExchange), and the corpus-proportional
    # occurrence stream is joined ONCE. Identical integer sums feed the
    # identical mixture expression, so scores are bit-identical to the
    # join formulation.
    nll_tab = (
        bg.withColumn("c1", F.sum("c12").over(Window.partitionBy("w1")))
        .withColumn("c2", F.sum("c12").over(Window.partitionBy("w2")))
        .crossJoin(F.broadcast(total))
        .select("w1", "w2", (-F.log(p)).alias("__nll"))
    )
    # ``broadcast_model``: the nll table IS the trained model, and
    # shipping it to every worker (KenLM/fastText-style deployment)
    # removes the one corpus-proportional shuffle left in this plan (the
    # occurrence-side join exchange). r7 interleaved A/B: wash at sf0.1
    # (2.16 vs 2.36 s median), 4.26 -> 3.00 s at 10x data (the join
    # shuffle is the data term). BUT the table is sized by distinct
    # BIGRAM types, which keep growing with the corpus (unlike the
    # Heaps-bounded unigram vocabulary) — an unconditional hint would
    # abort at the driver's broadcast limit on a 100 TB corpus (ADVICE
    # r7). Default (None) is therefore size-gated: distinct bigrams <=
    # total bigram occurrences and a (w1, w2, nll) row is no wider than
    # the text that produced it, so the corpus scan size upper-bounds
    # the model table; broadcast only when THAT fits the session's
    # autoBroadcastJoinThreshold, else leave the join strategy to AQE.
    # The bound being loose does NOT forfeit the r7 win: when the static
    # gate stays off, AQE's runtime re-plan broadcasts the MATERIALIZED
    # nll stage anyway (measured at 10x: executed plan shows 1
    # BroadcastHashJoin with the gate off; gate-off vs forced hint is an
    # interleaved wash, 1.93-2.37 vs 1.88-2.27 s) — with exact runtime
    # sizing, which a static estimate can never beat, and no abort risk
    # when bigram types outgrow the budget at 100 TB.
    if broadcast_model is None:
        from etl_io_spark.partitioning import (
            broadcast_budget_bytes,
            plan_size_bytes,
        )

        broadcast_model = plan_size_bytes(df) <= broadcast_budget_bytes(df)
    if broadcast_model:
        nll_tab = F.broadcast(nll_tab)
    scored = occ.join(nll_tab, ["w1", "w2"]).select(
        F.col(id_col), *carry_cols, "__nll"
    )
    return scored.groupBy(id_col, *carry).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("__nll"), round_to).alias("cross_entropy"),
    )


def ccnet_buckets(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str = "lang",
    alpha: float = 0.4,
    round_to: int = 6,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020,
    arXiv:1911.00359): score every document with the corpus-trained
    bigram-LM cross-entropy (:func:`lm_cross_entropy`), rank WITHIN each
    language, and split into head / middle / tail terciles — the classic
    "keep the head, sample the middle, drop the tail" curation gate.
    Returns one row per (lang, bucket): doc count and the bucket's
    cross-entropy mean/min/max.

    The language tag rides the LM scorer's group key via ``carry`` (it is
    functionally dependent on the doc id), so NO post-hoc doc_id join of
    the documents table is needed. Tercile assignment is ``ntile(3)``
    ordered by the ROUNDED score with the doc id as tiebreak — a total
    order, so the split is engine-reproducible (SQL ``NTILE`` has the
    same remainder-to-leading-buckets semantics).

    Scale note: ntile needs a per-language sort, and languages are few —
    a skewed sort key at corpus scale. Production CCNet derives the two
    cut points from a SAMPLE and maps each doc by comparison (pure scan);
    this operator is the exact-tercile variant the sampled one is
    validated against — swap in approx_percentile cut points when the
    per-language volume no longer fits a sort partition.
    """
    from pyspark.sql import Window

    ce = lm_cross_entropy(
        df, id_col, text_col, alpha=alpha, round_to=round_to,
        carry=(lang_col,),
    )
    w = Window.partitionBy(lang_col).orderBy("cross_entropy", id_col)
    bucket = (
        F.when(F.col("__b") == 1, F.lit("head"))
        .when(F.col("__b") == 2, F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        ce.withColumn("__b", F.ntile(3).over(w))
        .groupBy(F.col(lang_col), bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("cross_entropy"), round_to).alias("avg_ce"),
            F.min("cross_entropy").alias("min_ce"),
            F.max("cross_entropy").alias("max_ce"),
        )
    )


def corpus_datacard(
    df: DataFrame,
    text_col: str,
    source_col: str = "source",
    lang_col: str = "lang",
    round_to: int = 6,
) -> DataFrame:
    """Per-source corpus data card (the 'datasheet for datasets' summary,
    Gebru et al. 2021): document and character volume, exact-duplicate
    rate, mean composite quality score, language count and the Shannon
    entropy (nats) of the language mix — the one-page health report a
    curation pipeline publishes per ingested source.

    Exact-dup detection groups the 60-bit md5 content hash, not the raw
    text — at 100 TB the distinct-count shuffle then moves 8-byte keys
    (cross-engine-exact, so the oracle reproduces it). Ratios of integer
    counts use floor-form double rounding (terminating-decimal ROUND
    ties break differently per engine — see robust_anomaly); the
    log-based entropy keeps plain ROUND with negative-zero
    normalization (a single-language source computes -0.0 on one side).

    Shape: one scan for the per-source roll-up and one for the
    (source, lang) counts that feed the mix entropy — the second pass
    re-derives only (source, lang), so column pruning makes it a
    metadata-cheap scan; both aggregates are source-cardinality-sized,
    joined broadcast at the end.
    """
    base = spread_text(df).select(
        F.col(source_col).alias("source"),
        F.col(lang_col).alias("lang"),
        F.length(text_col).alias("__nc"),
        hash60(F.col(text_col)).alias("__h"),
        # NULL text has no quality score (the CASE battery would
        # otherwise award its punct term to NULL on one engine only);
        # AVG skips NULLs identically on both sides (round-10)
        F.when(
            F.col(text_col).isNotNull(),
            F.round(quality_score_expr(text_col), 2),
        ).alias("__q"),
    )
    per_source = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__nc").cast("bigint").alias("total_chars"),
        F.count_distinct("__h").alias("n_unique"),
        (
            F.floor(
                (F.count(F.lit(1)) - F.count_distinct("__h"))
                * F.lit(1000000)
                / F.count(F.lit(1))
                + F.lit(0.5)
            )
            / F.lit(1000000)
        ).alias("dup_rate"),
        (F.floor(F.avg("__q") * F.lit(10000) + F.lit(0.5)) / F.lit(10000)).alias(
            "avg_quality"
        ),
    )
    lang_counts = base.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("__c")
    )
    lang_mix = lang_counts.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_langs"),
        round_pz(
            F.log(F.sum("__c"))
            - F.sum(F.col("__c") * F.log("__c")) / F.sum("__c"),
            round_to,
        ).alias("lang_entropy"),
    )
    return per_source.join(lang_mix, "source")


def tokenizer_fertility(
    df: DataFrame,
    text_col: str,
    lang_col: str = "lang",
) -> DataFrame:
    """Tokenizer fertility per language: BPE-ish subword tokens per
    whitespace word, and characters per subword token — the standard
    multilingual tokenizer-efficiency diagnostic (a fertility far above
    the English baseline means the tokenizer fragments that language,
    inflating training cost per byte of content; cf. the NLLB / XLM-R
    tokenizer analyses). Uses the deterministic :data:`BPE_PATTERN`
    proxy so both engines count identical units.

    One scan, one language-keyed partial agg; ratios are of summed
    integer counts (floor-form rounded — int/int terminates in decimal),
    zero-guarded so a language of empty documents reports 0.0 rather
    than engine-divergent inf/NULL division."""
    base = spread_text(df).select(
        F.col(lang_col).alias("lang"),
        token_count_ws(text_col).alias("__ws"),
        token_count_bpe(text_col).alias("__bpe"),
        F.length(F.translate(F.col(text_col), _WS, "")).alias("__ch"),
    )

    def ratio6(num: Column, den: Column) -> Column:
        return F.when(
            den > 0,
            F.floor(num * F.lit(1000000) / den + F.lit(0.5)) / F.lit(1000000),
        ).otherwise(F.lit(0.0))

    return base.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("__ws").cast("bigint").alias("total_words"),
        F.sum("__bpe").cast("bigint").alias("total_tokens"),
        ratio6(F.sum("__bpe"), F.sum("__ws")).alias("fertility"),
        ratio6(F.sum("__ch"), F.sum("__bpe")).alias("chars_per_token"),
    )


def rake_keywords(
    df: DataFrame,
    id_col: str,
    text_col: str,
    stopwords: Sequence[str] = STOPWORDS,
    top_k: int = 20,
) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal stopword-free token runs; each word scores degree/frequency
    (degree = Σ length of phrases containing it, frequency = occurrence
    count); a phrase scores the sum of its words' scores. Returns the
    corpus top-``top_k`` phrases by score: ``(phrase, n_occurrences,
    score)``.

    Determinism: word scores are quantized to integer MILLI-scores with
    floor division (``deg·1000 // freq``) and phrase scores are exact
    int64 sums of those — no float summation anywhere until the final
    /1000.0 display conversion, so engines agree bit-for-bit (the same
    trick as filters.quality_classifier). Ranking ties break on the
    phrase string.

    Plan (windowless, round-5): phrase segmentation happens entirely
    MAP-SIDE in array/string expressions — stopwords in the lowered
    token array become a sentinel, ``array_join`` + ``split`` on the
    sentinel yields each document's phrase list, and one posexplode
    emits (phrase_index, phrase) rows. The previous formulation ran TWO
    doc-keyed window functions (a running stopword count and a phrase
    length), which forced a full shuffle+sort of every token row; this
    plan's only corpus-proportional shuffles are the vocab-sized word
    aggregation and the (doc, phrase) score aggregation. The per-phrase
    word relation is NOT pinned (r12-opt): it is map-only — there is no
    exchange for the cache to save, recomputing the tokenize+explode per
    consumer scales linearly, and the pin exposed the two consumers to
    the AQE concurrent-materialization race (26 s of task time blocked
    on cache fill at sf0.1 profiles). Interleaved A/B medians: persist
    0.98 vs recompute 0.90 s at sf0.1, 9.03 vs 7.18 s at 500k docs —
    recompute wins at BOTH scales. All expression-level — no UDFs.
    """
    from pyspark.sql import Window as W

    stop_lower = [w.lower() for w in stopwords]
    toks = tokens(text_col)
    sent = F.transform(
        toks,
        lambda t: F.when(
            F.lower(t).isin(*stop_lower), F.lit("\x01")
        ).otherwise(F.lower(t)),
    )
    phrases_arr = F.filter(
        F.split(F.array_join(sent, " "), "[ \t\n\f\r]*\x01[ \t\n\f\r]*"),
        lambda p: p != F.lit(""),
    )
    occ = spread_text(df).select(
        F.col(id_col).alias("__doc"),
        F.posexplode(phrases_arr).alias("__pid", "__phrase"),
    )
    pw = occ.select(
        "__doc", "__pid", "__phrase", F.split("__phrase", " ").alias("__wa")
    ).select(
        "__doc",
        "__pid",
        "__phrase",
        F.size("__wa").alias("__plen"),
        F.explode("__wa").alias("__w"),
    )
    stats = pw.groupBy("__w").agg(
        F.count(F.lit(1)).alias("__freq"),
        F.sum("__plen").alias("__deg"),
    )
    # integer milli-score: exact in any engine (floor division). stats is
    # vocab-sized — broadcast it, so scoring is map-side into one
    # (doc, phrase) aggregation
    phrases = (
        pw.join(F.broadcast(stats), "__w")
        .groupBy("__doc", "__pid", F.col("__phrase").alias("phrase"))
        .agg(F.sum(F.expr("div(__deg * 1000, __freq)")).alias("__ps"))
    )
    ranked = phrases.groupBy("phrase").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min("__ps").alias("__ps"),  # identical for equal phrases
    )
    w_rank = W.orderBy(F.col("__ps").desc(), F.col("phrase"))
    return (
        ranked.withColumn("__rn", F.row_number().over(w_rank))
        .where(F.col("__rn") <= top_k)
        .select(
            "phrase",
            "n_occurrences",
            (F.col("__ps") / F.lit(1000.0)).alias("score"),
        )
    )


def boilerplate_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    top_k: int = 50,
) -> DataFrame:
    """Corpus boilerplate detector: the ``top_k`` word ``n``-grams by
    DOCUMENT frequency (each document counts a gram once, however many
    times it repeats inside) — the CCNet/C4-style pre-pass for spotting
    shared headers, footers, license blurbs, and template chrome before
    a boilerplate-strip rule is written. Returns (gram, doc_freq),
    tie-broken by gram ascending so the top-k cut is deterministic.

    Plan: shingle map-side (``word_ngrams`` — sequence + element_at, no
    per-shingle sub-array; the token array is bound to a column FIRST —
    higher-order functions are interpreted with no CSE, so shingling
    the raw string re-tokenizes the document once per gram),
    ``array_distinct`` per row (in-row repeats collapse before anything
    moves), then ``count_distinct(id)`` per gram — the distinct agg's
    partial per-partition dedup keeps the exchange at distinct
    (gram, doc) pairs, and it is what makes the count a true DOC
    frequency even when the same ``id_col`` spans multiple rows. The
    final selection is ``ORDER BY doc_freq DESC, gram LIMIT k`` —
    Catalyst's TakeOrdered, a per-partition top-k + driver merge of
    k-row heaps, never a global sort (same shape the plan test pins for
    top_k_orders)."""
    # Tokenize into a BOUND column first: word_ngrams over the raw
    # string would capture the split+filter inside the transform lambda
    pairs = _doc_gram_pairs(df, id_col, text_col, n)
    return (
        pairs.groupBy("gram")
        .agg(F.count_distinct("__doc").alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("gram").asc())
        .limit(top_k)
    )


def _doc_gram_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(__doc, gram) rows for the boilerplate family — one row per
    (document, distinct n-gram-within-row). Encodes two invariants both
    callers must share: (1) the token array is BOUND to a column before
    ``word_ngrams`` touches it (higher-order functions are interpreted,
    no CSE — shingling the raw string re-tokenizes the document once
    per gram per element_at, measured 33 us vs ~1 us per gram); (2) the
    NULL contract: NULL text AND NULL ids are excluded — an
    unidentified document cannot carry document frequency, and leaving
    NULLs in would make engines disagree (Spark's count_distinct skips
    NULL docs while a SQL COUNT(*) over distinct pairs counts the NULL
    pseudo-doc once; GROUP BY would merge ALL NULL-id docs into one).
    ``array_distinct`` collapses in-row repeats map-side before
    anything moves."""
    toked = spread_text(
        df.where(F.col(text_col).isNotNull() & F.col(id_col).isNotNull())
    ).select(F.col(id_col).alias("__doc"), tokens(text_col).alias("__toks"))
    return toked.select(
        "__doc",
        F.explode(
            F.array_distinct(word_ngrams(F.col("__toks"), n))
        ).alias("gram"),
    )


def boilerplate_density(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_df: int = 2,
    round_to: int = 4,
) -> DataFrame:
    """Per-document boilerplate density: the fraction of the document's
    DISTINCT word ``n``-grams whose corpus document frequency is >=
    ``min_df`` — the per-doc counterpart of ``boilerplate_ngrams`` (a
    high fraction marks template chrome / mirrored pages; the standard
    curation gate thresholds on it). Documents with fewer than ``n``
    tokens yield no grams and are absent from the output (nothing to
    measure, mirroring the SQL grouping); NULL text is excluded.

    Plan: shingle map-side over a BOUND token column (HOFs are
    interpreted — binding avoids per-gram re-tokenization),
    ``array_distinct`` per row, explode, then a (doc, gram) ``distinct``
    so multi-row documents still count once; each gram's document
    frequency comes from an UNSORTED count window partitioned by gram
    (no self-join, no second aggregate branch), and one partial-agg
    groupBy(doc) folds the density. Three keyed exchanges, all carrying
    distinct (doc, gram) pairs — never raw shingle volume. A
    stop-the-world gram (present in every document) makes one window
    partition doc-sized; that is the theoretical max and still
    |docs| << |pairs|.

    ``boiler_frac`` is an int/int ratio → floor-form rounding (the
    terminating-decimal ROUND class); oracles mirror
    ``FLOOR(CAST(SUM(..) AS DOUBLE) / COUNT(*) * 10^k + 0.5) / 10^k``
    term by term."""
    from pyspark.sql import Window

    pairs = _doc_gram_pairs(df, id_col, text_col, n).distinct()
    wg = Window.partitionBy("gram")
    flagged = pairs.withColumn(
        "__gdf", F.count(F.lit(1)).over(wg)
    )
    return flagged.groupBy(F.col("__doc").alias(id_col)).agg(
        F.count(F.lit(1)).alias("n_grams"),
        round_floor(
            F.sum(
                F.when(F.col("__gdf") >= min_df, 1).otherwise(0)
            ).cast("double")
            / F.count(F.lit(1)),
            round_to,
        ).alias("boiler_frac"),
    )

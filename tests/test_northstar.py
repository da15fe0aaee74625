"""North-star operator tests: dedup families, similarity search, text
analysis — invariant-based where no SQL oracle exists (SURVEY.md §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from etl_io_spark.operators import dedup, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    near = "the quick brown fox jumps over the lazy dog and runs far away now"
    other = "completely different content about spark engines and parquet files here"
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=base),
            Row(doc_id=2, text=base),        # exact dup of 1
            Row(doc_id=3, text=near),        # near dup of 1 (1 token changed)
            Row(doc_id=4, text=other),       # unrelated
        ]
    )


# ---------------------------------------------------------------- dedup
def test_exact_dedup_groups(spark, docs):
    out = {r["keep_id"]: r["n_dups"] for r in dedup.exact_dedup(docs, "doc_id", "text").collect()}
    assert out == {1: 2, 3: 1, 4: 1}


def test_exact_dedup_by_hash_same_groups(spark, docs):
    out = dedup.exact_dedup(docs, "doc_id", "text", by_hash=True)
    assert {r["n_dups"] for r in out.collect()} == {2, 1}


def test_ngram_jaccard_finds_near_dup(spark, docs):
    pairs = {
        (r["a"], r["b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.1).collect()
    }
    assert pairs[(1, 2)] == 1.0          # identical docs
    assert 0.5 < pairs[(1, 3)] < 1.0     # near dup
    assert (1, 4) not in pairs           # unrelated


def test_minhash_identical_docs_identical_sigs(spark, docs):
    sig = dedup.minhash_signatures(docs, "doc_id", "text", num_perm=8)
    rows = sig.collect()
    s = {i: {r["j"]: r["minhash"] for r in rows if r["doc_id"] == i} for i in (1, 2, 4)}
    assert s[1] == s[2]
    assert s[1] != s[4]


def test_minhash_lsh_candidates_recall_and_precision(spark, docs):
    cand = dedup.minhash_lsh_candidates(docs, "doc_id", "text", num_perm=16, bands=4)
    got = {(r["a"], r["b"]): r["est_jaccard"] for r in cand.collect()}
    assert got[(1, 2)] == 1.0            # exact dup always caught
    assert (1, 4) not in got and (2, 4) not in got and (3, 4) not in got


def test_simhash_hamming(spark, docs):
    sig = dedup.simhash(docs, "doc_id", "text", bits=32)
    s = {r["doc_id"]: r["simhash"] for r in sig.collect()}
    assert s[1] == s[2]  # identical text -> identical signature
    near = bin(s[1] ^ s[3]).count("1")
    far = bin(s[1] ^ s[4]).count("1")
    assert near < far  # near-dup closer in hamming space than unrelated


def test_simhash_hamming_distance_expr(spark):
    df = spark.createDataFrame([Row(a=0b1011, b=0b0010)])
    got = df.select(dedup.hamming_distance(F.col("a"), F.col("b")).alias("d")).collect()[0]["d"]
    assert got == 2


# ---------------------------------------------------------------- similarity
@pytest.fixture(scope="module")
def emb(spark):
    from etl_io_spark.catalog import TableCatalog

    return TableCatalog(spark, "/root/testdata/sf0.001").table("embeddings")


def test_brute_force_topk_shape_and_selfsim(spark, emb):
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.brute_force_topk(emb, q, k=5).collect()
    assert len(out) == 15
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        sims = [r["cosine_sim"] for r in sorted(rows, key=lambda r: r["rank"])]
        assert sims == sorted(sims, reverse=True)  # top-k monotonicity
        assert all(-1.0001 <= s <= 1.0001 for s in sims)


def test_ann_lsh_recall_vs_bruteforce(spark, emb):
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.brute_force_topk(emb, q, k=10, assume_normalized=True)
    approx = similarity.ann_lsh_topk(emb, q, k=10, planes=3, tables=4)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5  # 4 tables × (3 planes / 8 buckets) on random vectors


def test_neardup_identical_vectors(spark):
    v = [1.0] + [0.0] * 3
    df = spark.createDataFrame(
        [Row(vec_id=1, embedding=v), Row(vec_id=2, embedding=v),
         Row(vec_id=3, embedding=[0.0, 1.0, 0.0, 0.0])]
    )
    out = similarity.neardup_pairs_cosine(df, threshold=0.99, dims=4, exact=True)
    assert [(r["a"], r["b"]) for r in out.collect()] == [(1, 2)]


# ---------------------------------------------------------------- text
def test_quality_features_empty_text(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="")])
    r = text.quality_features(df, "doc_id", "text").collect()[0]
    assert r["n_words"] == 0 and r["mean_word_len"] == 0.0


def test_text_battery_null_text_contract(spark):
    """NULL text: counts are NULL (never the non-ANSI size(NULL) = -1
    sentinel), ratios fall to their guarded defaults, and corpus stats
    exclude the doc — the round-10 adversarial-corpus pin."""
    from etl_io_spark.operators import filters

    df = spark.createDataFrame(
        [(1, None), (2, "a b c")], "doc_id int, text string"
    )
    q = {r["doc_id"]: r for r in text.quality_features(df, "doc_id", "text").collect()}
    assert q[1]["n_words"] is None and q[1]["n_chars"] is None
    assert q[2]["n_words"] == 3

    g = {r["doc_id"]: r for r in filters.gopher_rules(df, "doc_id", "text").collect()}
    assert g[1]["n_words"] is None
    assert g[1]["ellipsis_end_ratio"] is None
    assert g[1]["ok_words"] is None
    assert g[1]["keep"] is False  # some rule is definitively False

    o = {r["doc_id"]: r for r in text.oov_rate(df, "doc_id", "text", 10).collect()}
    assert o[1]["n_tokens"] is None and o[1]["n_oov"] is None
    assert o[1]["oov_rate"] is None

    rep = {r["doc_id"]: r for r in text.repetition_features(df, "doc_id", "text").collect()}
    assert rep[1]["n_words"] is None

    fp = {r["doc_id"]: r for r in text.fingerprint(df, "doc_id", "text").collect()}
    assert fp[1]["md5_hex"] is None and fp[1]["rolling_hash"] is None


def test_token_counts(spark):
    df = spark.createDataFrame([Row(doc_id=1, text="hello world, x2!")])
    r = df.select(
        text.token_count_ws("text").alias("ws"),
        text.token_count_bpe("text").alias("bpe"),
    ).collect()[0]
    assert r["ws"] == 3
    # hello | world | , | x | 2 | !
    assert r["bpe"] == 6
    # NULL text counts as NULL (standard null propagation) — NOT the
    # legacy size(NULL) = -1 sentinel of the old split form, which
    # silently shifted pack_sequences' running token sums
    nulls = spark.createDataFrame(
        [Row(doc_id=1, text=None), Row(doc_id=2, text="  "), Row(doc_id=3, text="")],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: (r["ws"], r["q"])
        for r in nulls.select(
            "doc_id",
            text.token_count_ws("text").alias("ws"),
            F.round(text.quality_score_expr("text"), 2).alias("q"),
        ).collect()
    }
    # the quality battery's ratio guards default NULL inputs to 0.0, so
    # NULL text scores like empty text (0.3: only the punct gate passes)
    assert got[1] == (None, 0.3)
    assert got[2] == (0, 0.3) and got[3] == (0, 0.3)


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="the cat of the house and a dog"),
            Row(doc_id=2, text="der hund ist und das haus"),
            Row(doc_id=3, text="xyzzy plugh"),
        ]
    )
    out = {r["doc_id"]: r["lang_pred"] for r in text.lang_id(df, "doc_id", "text").collect()}
    assert out == {1: "en", 2: "de", 3: "und"}


def test_fingerprint_rolling_hash_matches_python(spark):
    s = "spark engine"
    df = spark.createDataFrame([Row(doc_id=1, text=s)])
    r = text.fingerprint(df, "doc_id", "text").collect()[0]
    acc = 0
    for ch in s:
        acc = (acc * 31 + ord(ch)) % text.ROLLING_MOD
    assert r["rolling_hash"] == acc
    import hashlib

    assert r["md5_hex"] == hashlib.md5(s.encode()).hexdigest()


def test_connected_components_path_and_island(spark):
    # path 1-2-3-4 (worst case for min propagation) + island 10-11 + 20 alone
    pairs = spark.createDataFrame(
        [Row(a=1, b=2), Row(a=2, b=3), Row(a=3, b=4), Row(a=10, b=11)]
    )
    out = {
        r["id"]: r["cluster_id"]
        for r in dedup.connected_components(pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_connected_components_idempotent(spark):
    pairs = spark.createDataFrame([Row(a=5, b=3), Row(a=3, b=9)])
    comp = dedup.connected_components(pairs)
    again = dedup.connected_components(
        comp.select(F.col("id").alias("a"), F.col("cluster_id").alias("b"))
    )
    assert sorted(map(tuple, comp.collect())) == sorted(
        map(tuple, again.collect())
    )


def test_fuzzy_pairs_chunked_matches_unchunked(spark):
    """chunks=C decomposes each block's pair grid into C² chunk-pairs
    (replicated index side, hash-split probe side) — parallelism hatch
    for few-fat-blocks inputs; the pair set must be identical."""
    rows = [
        Row(id=i, name=f"name {'x' * (i % 4)}{i % 3}", blk=i % 2)
        for i in range(1, 25)
    ]
    df = spark.createDataFrame(rows)
    base = sorted(
        map(
            tuple,
            dedup.fuzzy_pairs(df, "id", "name", "blk", max_distance=2).collect(),
        )
    )
    assert len(base) > 0
    for c in (2, 5):
        got = sorted(
            map(
                tuple,
                dedup.fuzzy_pairs(
                    df, "id", "name", "blk", max_distance=2, chunks=c
                ).collect(),
            )
        )
        assert got == base, c


def test_fuzzy_pairs_segmented_matches_blocked(spark):
    rows = [
        Row(id=1, name="jonathan smith", blk=1),
        Row(id=2, name="jonathon smith", blk=1),   # ed 1
        Row(id=3, name="maria garcia", blk=1),
        Row(id=4, name="maria garcya", blk=1),     # ed 1
        Row(id=5, name="completely different", blk=1),
        Row(id=6, name="jonathan smith", blk=2),   # other block: no cross pair
        Row(id=7, name="ab", blk=1),               # short-string fallback path
        Row(id=8, name="ac", blk=1),               # ed 1 with id=7
        Row(id=9, name="xy zz q", blk=1),
    ]
    df = spark.createDataFrame(rows)
    old = sorted(
        map(tuple, dedup.fuzzy_pairs(df, "id", "name", "blk", 2).collect())
    )
    new = sorted(
        map(
            tuple,
            dedup.fuzzy_pairs_segmented(df, "id", "name", "blk", 2).collect(),
        )
    )
    assert old == new
    assert (1, 2, 1) in old and (7, 8, 1) in old


def test_fuzzy_pairs_deletion_matches_blocked(spark):
    """FastSS deletion-neighborhood candidates must reproduce the plain
    blocked all-pairs lev<=1 set EXACTLY (recall is provable; precision
    comes from the verify step). Corpus exercises the hand-proved edge
    cases: substitutions, insertions (length differs by 1), the 'ab'/'ba'
    shared-variant-but-lev-2 false candidate, empty strings (the
    sequence(1,0) descending-range guard), and cross-block isolation."""
    import random

    rng = random.Random(7)
    alpha = "abcde"
    rows = [Row(id=100, name="", blk=1), Row(id=101, name="", blk=1),
            Row(id=102, name="a", blk=1),       # insertion pair with ""
            Row(id=103, name="ab", blk=1),
            Row(id=104, name="ba", blk=1),      # lev-2 false candidate
            Row(id=105, name="ab", blk=2)]      # other block: no cross pair
    base_strs = ["".join(rng.choice(alpha) for _ in range(rng.randint(3, 9)))
                 for _ in range(20)]
    nid = 200
    for s in base_strs:
        for variant in (
            s,
            s[:1] + rng.choice(alpha) + s[2:],          # substitution
            s[: len(s) // 2] + rng.choice(alpha) + s[len(s) // 2:],  # insert
            s[1:],                                       # deletion
        ):
            rows.append(Row(id=nid, name=variant, blk=nid % 2))
            nid += 1
    df = spark.createDataFrame(rows)
    want = sorted(map(tuple, dedup.fuzzy_pairs(
        df, "id", "name", "blk", max_distance=1).collect()))
    got = sorted(map(tuple, dedup.fuzzy_pairs_deletion(
        df, "id", "name", block_col="blk").collect()))
    assert got == want
    assert (100, 101, 0) in got and (100, 102, 1) in got
    assert not any(a == 103 and b == 104 for a, b, _ in got)
    # unblocked form vs constant-block plain join
    want_all = sorted(map(tuple, dedup.fuzzy_pairs(
        df, "id", "name", F.lit(1), max_distance=1).collect()))
    got_all = sorted(map(tuple, dedup.fuzzy_pairs_deletion(
        df, "id", "name").collect()))
    assert got_all == want_all and len(got_all) > len(got)


def test_fuzzy_pairs_deletion_k2_unsupported(spark):
    df = spark.createDataFrame([Row(id=1, name="ab", blk=1)])
    with pytest.raises(ValueError, match="max_distance=1"):
        dedup.fuzzy_pairs_deletion(df, "id", "name", max_distance=2)


def test_tfidf_top_terms_hand_computed(spark):
    import math

    df = spark.createDataFrame(
        [Row(doc_id=1, text="apple banana apple"), Row(doc_id=2, text="banana cherry")]
    )
    out = {
        (r["doc_id"], r["rank"]): (r["term"], r["tfidf"])
        for r in text.tf_idf_top_terms(df, "doc_id", "text", k=2).collect()
    }
    idf_rare = math.log(3 / 2) + 1  # df=1, N=2
    assert out[(1, 1)] == ("apple", round(2 * idf_rare, 6))
    assert out[(1, 2)] == ("banana", 1.0)  # idf = ln(1)+1
    assert out[(2, 1)] == ("cherry", round(idf_rare, 6))
    assert out[(2, 2)] == ("banana", 1.0)


def test_pmi_collocations_hand_computed(spark):
    import math

    # 7 tokens -> 6 bigrams: (a,b) x3 and (b,a) x3, so B = 6 and the slot
    # counts are cw(a) = cw(b) = 6; pmi = ln(3*6/(6*6)) = ln(0.5) for both,
    # tie broken lexicographically on w1
    df = spark.createDataFrame([Row(doc_id=1, text="a b a b a b a")])
    out = text.pmi_collocations(df, "doc_id", "text", min_count=2, k=10).collect()
    got = {(r["w1"], r["w2"]): (r["c12"], r["pmi"], r["rank"]) for r in out}
    assert got[("a", "b")] == (3, round(math.log(0.5), 6), 1)
    assert got[("b", "a")] == (3, round(math.log(0.5), 6), 2)


def test_connected_components_long_chain(spark):
    # 120-node path: plain min-propagation would need ~120 rounds; the
    # pointer-jumping variant must converge within the default max_iter
    pairs = spark.createDataFrame(
        [Row(a=i, b=i + 1) for i in range(1, 120)]
    )
    out = dedup.connected_components(pairs).collect()
    assert len(out) == 120
    assert {r["cluster_id"] for r in out} == {1}


def test_connected_components_fast_path_matches_loop(spark):
    """The round-7 driver union-find gate must be OUTPUT-IDENTICAL to the
    distributed pointer-jumping loop: same rows, same min-id cluster
    labels, on a graph mixing chains, stars, a cycle, and islands —
    including string node ids (the loop and the union-by-min rule are
    both id-type-agnostic)."""
    import random

    rng = random.Random(7)
    edges = (
        [(i, i + 1) for i in range(1, 30)]          # chain
        + [(100, 100 + i) for i in range(1, 8)]     # star
        + [(200, 201), (201, 202), (202, 200)]      # cycle
        + [(300, 301)]                              # island
        + [(rng.randint(400, 440), rng.randint(400, 440)) for _ in range(25)]
    )
    pairs = spark.createDataFrame(edges, "a bigint, b bigint")
    fast = sorted(map(tuple, dedup.connected_components(pairs).collect()))
    loop = sorted(
        map(
            tuple,
            dedup.connected_components(
                pairs, max_driver_edges=0
            ).collect(),
        )
    )
    assert fast == loop and len(fast) > 0

    spairs = spark.createDataFrame(
        [("d-b", "d-a"), ("d-b", "d-c"), ("x", "y")], "a string, b string"
    )
    out = {
        r["id"]: r["cluster_id"]
        for r in dedup.connected_components(spairs).collect()
    }
    assert out == {"d-a": "d-a", "d-b": "d-a", "d-c": "d-a", "x": "x", "y": "x"}


def test_connected_components_heterogeneous_and_null_ids(spark):
    """ADVICE r7: the driver fast path must (a) schema its output from the
    struct-array-coerced common type so int × bigint pairs don't fail
    createDataFrame verification, and (b) drop null-endpoint edges instead
    of raising TypeError in the union-find comparison — identically on
    both paths."""
    het = spark.createDataFrame(
        [(1, 2), (2, 3)], "a int, b bigint"
    )
    out = {r["id"]: r["cluster_id"]
           for r in dedup.connected_components(het).collect()}
    assert out == {1: 1, 2: 1, 3: 1}
    assert dict(dedup.connected_components(het).dtypes) == {
        "id": "bigint", "cluster_id": "bigint"
    }

    nulls = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None), (5, 6)], "a bigint, b bigint"
    )
    for gate in (2_000_000, 0):  # fast path and distributed loop
        got = {
            r["id"]: r["cluster_id"]
            for r in dedup.connected_components(
                nulls, max_driver_edges=gate
            ).collect()
        }
        assert got == {1: 1, 2: 1, 5: 5, 6: 5}, gate


def test_quantize_embeddings_error_bound(spark, emb):
    out = similarity.quantize_embeddings(emb.limit(50)).join(
        emb.limit(50), "vec_id"
    ).collect()
    for r in out:
        assert all(-127 <= q <= 127 for q in r["qvec"])
        # per-element reconstruction error is bounded by half a step
        for q, x in zip(r["qvec"], r["embedding"]):
            assert abs(q * r["qscale"] - x) <= r["qscale"] / 2 + 1e-12


def test_quantized_topk_recall_vs_exact(spark, emb):
    q = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = similarity.brute_force_topk(emb, q, k=10, assume_normalized=True)
    quant = similarity.quantized_topk(emb, q, k=10)
    e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]) for r in quant.collect()}
    assert len(e & a) / len(e) >= 0.9  # int8 error is tiny vs neighbor gaps


def test_segment_dedup_removes_repeated_spans(spark):
    seg = "w0 w1 w2 w3"  # one 4-token segment
    docs = spark.createDataFrame(
        [
            (1, seg + " unique1 a b c"),
            (2, seg + " other2 d e f"),   # first segment duplicates doc 1's
            (3, "totally different text here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in dedup.segment_dedup(docs, seg_tokens=4).collect()
    }
    assert out[1]["clean_text"] == seg + " unique1 a b c"
    # doc 2 loses the repeated first segment, keeps its own tail
    assert out[2]["clean_text"] == "other2 d e f"
    assert out[2]["n_kept"] == 1
    assert out[3]["clean_text"] == "totally different text here"


def test_segment_dedup_fully_duplicated_doc_survives_empty(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r for r in dedup.segment_dedup(docs, seg_tokens=4).collect()
    }
    assert out[1]["clean_text"] == "a b"
    assert out[2]["clean_text"] == "" and out[2]["n_kept"] == 0


def test_hard_negatives_excludes_same_label(spark, emb):
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    out = similarity.hard_negatives(emb, q, k=5).collect()
    qlabels = {r["vec_id"]: r["label"] for r in emb.where(F.col("vec_id") < 5).collect()}
    assert len(out) == 25
    for r in out:
        assert r["neighbor_label"] != qlabels[r["query_id"]]


def test_oov_rate_hand_case(spark):
    from etl_io_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a z"), (3, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in T.oov_rate(docs, vocab_size=2).collect()}
    # vocab = {a, b} (a:4, b:1 beat z:1 on count; b beats z lexicographically)
    assert out[1]["n_oov"] == 0 and out[1]["oov_rate"] == 0.0
    assert out[2]["n_tokens"] == 2 and out[2]["n_oov"] == 1
    assert abs(out[2]["oov_rate"] - 0.5) < 1e-9
    assert out[3]["n_tokens"] == 0 and out[3]["oov_rate"] == 0.0


def test_embedding_gram_matches_numpy(spark):
    import numpy as np

    rng = [[float(i * 3 + j) / 10 for j in range(3)] for i in range(5)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rng)], "vec_id long, embedding array<double>"
    )
    got = {(r["i"], r["j"]): r["v"] for r in similarity.embedding_gram(df).collect()}
    X = np.array(rng)
    G = X.T @ X
    for i in range(3):
        for j in range(i, 3):
            assert abs(got[(i, j)] - round(G[i, j], 6)) < 1e-9
    assert len(got) == 6  # upper triangle only


def test_kmeans_separates_obvious_clusters(spark):
    # ids 0,1 seed the two centroids; two tight blobs around (0,0) and (10,10)
    rows = [
        (0, [0.1, 0.0]), (1, [10.0, 10.1]),
        (2, [0.0, 0.2]), (3, [0.2, 0.1]),
        (4, [9.9, 10.0]), (5, [10.2, 9.8]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["cluster"] for r in
           similarity.kmeans_assign(df, k=2, iterations=3).collect()}
    assert {out[0], out[2], out[3]} == {0}
    assert {out[1], out[4], out[5]} == {1}


def test_incremental_neardup_gate_flags_known_dup(spark):
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again and again"),
         (2, "completely unrelated content about spark shuffles and joins")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog again and again"),
         (11, "fresh new text that matches nothing in the existing corpus")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dedup.incremental_neardup_gate(
        corpus, batch, "doc_id", "text").collect()}
    assert out[10]["is_neardup"] and out[10]["match_id"] == 1
    assert out[10]["est_jaccard"] == 1.0
    assert not out[11]["is_neardup"] and out[11]["match_id"] is None


def test_incremental_neardup_gate_ties_to_lowest_corpus_id(spark):
    """Two corpus docs with IDENTICAL text tie on est_jaccard; the
    round-6 max(struct(est, -cid)) best-match must pick the LOWEST
    corpus id — the same rule the old row_number window enforced."""
    txt = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(7, txt), (3, txt)], "doc_id long, text string"
    )
    batch = spark.createDataFrame([(10, txt)], "doc_id long, text string")
    r = dedup.incremental_neardup_gate(
        corpus, batch, "doc_id", "text"
    ).collect()[0]
    assert r["is_neardup"] and r["est_jaccard"] == 1.0
    assert r["match_id"] == 3  # lowest id wins the tie


def test_incremental_neardup_gate_string_ids(spark):
    """The gate's API is id-type-agnostic: with STRING doc ids the
    best-match aggregation must still return the real match and break
    ties to the lexicographically-lowest corpus id. The round-6 shape
    negated __cid inside max(struct(...)) — with string ids that
    implicit-casts to NULL doubles and silently returns match_id=NULL
    (ADVICE r6); the fix negates the always-double score instead."""
    txt = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [("doc-b", txt), ("doc-a", txt),
         ("doc-z", "completely unrelated content about spark shuffles")],
        "doc_id string, text string",
    )
    batch = spark.createDataFrame(
        [("new-1", txt), ("new-2", "fresh text matching nothing at all")],
        "doc_id string, text string",
    )
    out = {r["doc_id"]: r for r in dedup.incremental_neardup_gate(
        corpus, batch, "doc_id", "text").collect()}
    assert out["new-1"]["is_neardup"] and out["new-1"]["est_jaccard"] == 1.0
    assert out["new-1"]["match_id"] == "doc-a"  # lowest string id
    assert not out["new-2"]["is_neardup"] and out["new-2"]["match_id"] is None


# ------------------------------------------------------- semdedup / ccnet
def test_semdedup_keeps_lowest_id_per_neardup_group(spark):
    v = [1.0, 0.0, 0.0, 0.0]
    w = [0.0, 1.0, 0.0, 0.0]
    df = spark.createDataFrame(
        [Row(vec_id=5, embedding=v), Row(vec_id=2, embedding=v),
         Row(vec_id=9, embedding=v), Row(vec_id=7, embedding=w)]
    )
    out = {r["vec_id"]: r["keep"] for r in
           similarity.semdedup(df, threshold=0.99, planes=2, dims=4).collect()}
    # identical vectors share every sign bucket: only the lowest id keeps
    assert out == {2: True, 5: False, 9: False, 7: True}


def test_semdedup_orthogonal_vectors_all_kept_when_separated(spark):
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[1.0 if j == i else 0.0 for j in range(4)])
         for i in range(4)]
    )
    out = similarity.semdedup(df, threshold=0.5, planes=2, dims=4)
    # orthogonal vectors are never dominated regardless of bucketing
    # (cosine = 0 < threshold even when buckets collide)
    assert all(r["keep"] for r in out.collect())


def test_lm_cross_entropy_carry_matches_join(spark, docs):
    tagged = docs.withColumn("lang", F.lit("en"))
    carried = text.lm_cross_entropy(tagged, "doc_id", "text", carry=("lang",))
    plain = text.lm_cross_entropy(docs, "doc_id", "text")
    c = {r["doc_id"]: (r["lang"], r["n_bigrams"], r["cross_entropy"])
         for r in carried.collect()}
    p = {r["doc_id"]: (r["n_bigrams"], r["cross_entropy"])
         for r in plain.collect()}
    assert set(c) == set(p)
    for d, (lang, nb, ce) in c.items():
        assert lang == "en" and (nb, ce) == p[d]


def test_ccnet_buckets_tercile_counts_and_ordering(spark):
    rows = [Row(doc_id=i, lang="en",
                text=" ".join(["tok%d" % (i * 7 + k) for k in range(5)] * (1 + i % 3)))
            for i in range(9)]
    df = spark.createDataFrame(rows)
    out = text.ccnet_buckets(df, "doc_id", "text", lang_col="lang").collect()
    by_bucket = {r["bucket"]: r for r in out}
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert sum(r["n_docs"] for r in out) == 9
    # head has the LOWEST cross-entropy (most corpus-typical docs)
    assert by_bucket["head"]["max_ce"] <= by_bucket["middle"]["min_ce"]
    assert by_bucket["middle"]["max_ce"] <= by_bucket["tail"]["min_ce"]


def test_corpus_datacard_dup_rate_and_lang_mix(spark):
    rows = [
        Row(doc_id=1, source="s1", lang="en", text="alpha beta gamma"),
        Row(doc_id=2, source="s1", lang="en", text="alpha beta gamma"),
        Row(doc_id=3, source="s1", lang="de", text="delta epsilon zeta"),
        Row(doc_id=4, source="s1", lang="de", text="eta theta iota"),
        Row(doc_id=5, source="s2", lang="fr", text="kappa lambda mu"),
    ]
    out = {r["source"]: r for r in
           text.corpus_datacard(spark.createDataFrame(rows), "text").collect()}
    s1 = out["s1"]
    assert s1["n_docs"] == 4 and s1["n_unique"] == 3
    assert s1["dup_rate"] == 0.25
    assert s1["n_langs"] == 2
    # balanced 2/2 mix: entropy = ln 2
    assert abs(s1["lang_entropy"] - 0.693147) < 1e-6
    s2 = out["s2"]
    assert s2["dup_rate"] == 0.0 and s2["n_langs"] == 1
    assert s2["lang_entropy"] == 0.0  # and not -0.0


def test_tokenizer_fertility_hand_case(spark):
    rows = [
        Row(doc_id=1, lang="en", text="ab cd"),        # 2 words, 2 bpe, 4 ch
        Row(doc_id=2, lang="xx", text="a-b c!"),       # 2 words, 5 bpe, 5 ch
        Row(doc_id=3, lang="zz", text=""),             # empty: zero-guard
    ]
    out = {r["lang"]: r for r in
           text.tokenizer_fertility(spark.createDataFrame(rows), "text").collect()}
    assert out["en"]["fertility"] == 1.0
    assert out["en"]["chars_per_token"] == 2.0
    assert out["xx"]["fertility"] == 2.5
    assert out["xx"]["chars_per_token"] == 1.0
    assert out["zz"]["fertility"] == 0.0 and out["zz"]["chars_per_token"] == 0.0

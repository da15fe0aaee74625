"""Unit tests for training-data hygiene (contamination, repetition) and
time-series operators (histogram, rolling z-score, resample+ffill) on
tiny hand-computed frames."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F

from etl_io_spark.operators import aggregate as agg
from etl_io_spark.operators import text, timeseries
from etl_io_spark.operators import window as win


# ----------------------------------------------------------- contamination
def test_contamination_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a b c d e f"),  # grams: abc bcd cde def
            Row(doc_id=2, text="x y z w v"),  # grams: xyz yzw zwv
            Row(doc_id=3, text="a b"),  # too short: 0 grams
        ]
    )
    bench = spark.createDataFrame([Row(doc_id=9, text="b c d e")])
    out = {
        r["doc_id"]: r
        for r in text.contamination(
            docs, bench, "doc_id", "text", n=3
        ).collect()
    }
    # bench grams: {"b c d", "c d e"} — doc 1 matches 2 of its 4
    assert out[1]["n_ngrams"] == 4 and out[1]["n_matched"] == 2
    assert out[1]["contamination"] == 0.5 and out[1]["contaminated"]
    assert out[2]["n_matched"] == 0 and not out[2]["contaminated"]
    # zero-gram docs survive with contamination 0, not dropped
    assert out[3]["n_ngrams"] == 0 and out[3]["contamination"] == 0.0


def test_contamination_self_overlap_is_total(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="p q r s t")])
    out = text.contamination(docs, docs, "doc_id", "text", n=2).collect()[0]
    assert out["contamination"] == 1.0 and out["contaminated"]


# -------------------------------------------------------------- repetition
def test_repetition_features_hand_computed(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="a a a a"),  # words 4/1 distinct; bigrams 3/1
            Row(doc_id=2, text="a b c d"),  # all unique
            Row(doc_id=3, text=""),  # empty
        ]
    )
    out = {
        r["doc_id"]: r
        for r in text.repetition_features(docs, "doc_id", "text").collect()
    }
    assert out[1]["dup_word_frac"] == 0.75
    assert out[1]["dup_bigram_frac"] == round(1 - 1 / 3, 6)
    assert out[1]["dup_trigram_frac"] == 0.5
    assert out[2]["dup_word_frac"] == 0.0
    assert out[3]["n_words"] == 0 and out[3]["dup_word_frac"] == 0.0


# --------------------------------------------------------------- histogram
def test_histogram_edges_and_counts(spark):
    df = spark.createDataFrame([Row(x=float(v)) for v in range(11)])
    out = {
        r["bucket"]: r for r in agg.histogram(df, "x", nbins=5).collect()
    }
    # lo=0, hi=10, step=2: buckets [0,2) [2,4) ... and hi folds into last
    assert {b: out[b]["n"] for b in sorted(out)} == {
        0: 2, 1: 2, 2: 2, 3: 2, 4: 3
    }
    assert out[4]["bucket_lo"] == 8.0
    assert sum(r["n"] for r in out.values()) == 11  # nothing dropped


def test_histogram_measures_sum(spark):
    df = spark.createDataFrame([Row(x=1.0, q=2.0), Row(x=9.0, q=5.0)])
    out = {r["bucket"]: r for r in agg.histogram(
        df, "x", nbins=2, measures=["q"]).collect()}
    assert out[0]["sum_q"] == 2.0 and out[1]["sum_q"] == 5.0


# ------------------------------------------------------------ rolling z
def test_rolling_zscore_hand_computed(spark):
    rows = [Row(k=1, i=i, v=float(v)) for i, v in enumerate([1, 3, 2, 100])]
    df = spark.createDataFrame(rows)
    out = {
        r["i"]: r
        for r in win.rolling_zscore(
            df, ["k"], ["i"], "v", lookback=10
        ).collect()
    }
    # first two rows: <2 preceding values -> NULL score
    assert out[0]["zscore"] is None and out[1]["zscore"] is None
    # row 2: preceding {1,3}: mean 2, sd sqrt(2) -> z=0
    assert out[2]["zscore"] == 0.0 and out[2]["is_anomaly"] is False
    # row 3: preceding {1,3,2}: mean 2, sd 1 -> z=98
    assert out[3]["zscore"] == 98.0 and out[3]["is_anomaly"] is True


def test_rolling_zscore_constant_window_null(spark):
    df = spark.createDataFrame(
        [Row(k=1, i=i, v=5.0) for i in range(4)]
    )
    out = win.rolling_zscore(df, ["k"], ["i"], "v").collect()
    assert all(r["zscore"] is None for r in out)  # sd == 0 everywhere


# ---------------------------------------------------------- resample/ffill
def test_resample_ffill_fills_gaps(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        Row(k=1, ts=t0, v=10.0, eid=1),
        # gap: hours 1 and 2 empty
        Row(k=1, ts=t0 + dt.timedelta(hours=3), v=40.0, eid=2),
        # two obs in the same bucket: later one wins
        Row(k=1, ts=t0 + dt.timedelta(hours=3, minutes=10), v=41.0, eid=3),
    ]
    df = spark.createDataFrame(rows)
    out = sorted(
        timeseries.resample_ffill(
            df, "k", "ts", "v", step="1 hour", tiebreak_col="eid"
        ).collect(),
        key=lambda r: r["bucket_ts"],
    )
    assert len(out) == 4  # hours 0..3 inclusive
    assert [r["v"] for r in out] == [10.0, 10.0, 10.0, 41.0]
    assert [r["filled"] for r in out] == [False, True, True, False]
    assert out[0]["bucket_ts"] == dt.datetime(2024, 1, 1, 0, 0)


def test_resample_ffill_per_key_grid(spark):
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            Row(k=1, ts=t0, v=1.0, eid=1),
            Row(k=1, ts=t0 + dt.timedelta(hours=5), v=2.0, eid=2),
            Row(k=2, ts=t0 + dt.timedelta(hours=2), v=3.0, eid=3),
        ]
    )
    out = timeseries.resample_ffill(
        df, "k", "ts", "v", tiebreak_col="eid"
    ).collect()
    # key 1 spans 6 hourly buckets, key 2 exactly 1 — grids are per-key
    assert sum(1 for r in out if r["k"] == 1) == 6
    assert sum(1 for r in out if r["k"] == 2) == 1


# ------------------------------------------------------------- sessionize
def test_sessionize_gap_boundaries(spark):
    t0 = dt.datetime(2024, 1, 1)
    m = dt.timedelta(minutes=1)
    rows = [
        Row(k=1, ts=t0 + i * m) for i in (0, 10, 20)  # one session
    ] + [
        Row(k=1, ts=t0 + 60 * m),  # 40-min gap: new session
        Row(k=2, ts=t0),  # other key: own numbering
    ]
    out = win.sessionize(
        spark.createDataFrame(rows), "k", "ts", gap="30 minutes"
    ).collect()
    sess = {(r["k"], r["ts"]): r["session_id"] for r in out}
    assert sess[(1, t0)] == 1
    assert sess[(1, t0 + 20 * m)] == 1
    assert sess[(1, t0 + 60 * m)] == 2
    assert sess[(2, t0)] == 1


def test_sessionize_exact_gap_is_same_session(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [Row(k=1, ts=t0), Row(k=1, ts=t0 + dt.timedelta(minutes=30))]
    out = win.sessionize(
        spark.createDataFrame(rows), "k", "ts", gap="30 minutes"
    ).collect()
    # boundary is strict (> gap), matching session_window semantics
    assert {r["session_id"] for r in out} == {1}


# ------------------------------------------------------------ vocab top-k
def test_vocab_top_tokens_counts_and_ties(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="b a b c"), Row(doc_id=2, text="a b z")]
    )
    out = text.vocab_top_tokens(docs, "text", k=3).collect()
    assert [(r["token"], r["cnt"], r["rank"]) for r in out] == [
        ("b", 3, 1),
        ("a", 2, 2),
        ("c", 1, 3),  # tie with 'z' broken lexicographically
    ]


def test_rolling_distinct_hand_case(spark):
    # users 1,2 on day 1; user 2 on day 3; user 3 on day 9.
    # 3-day windows: day1 -> {1,2}; day3 -> {1,2}(from day1) + {2} = {1,2};
    # day9 -> {3} (days 1/3 fell out); days 2,4..8 have no events -> absent
    rows = [
        (1, dt.datetime(2024, 1, 1, 5)),
        (2, dt.datetime(2024, 1, 1, 6)),
        (2, dt.datetime(2024, 1, 3, 1)),
        (3, dt.datetime(2024, 1, 9, 1)),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp")
    out = {
        r["day"].isoformat(): r["rolling_3d_distinct"]
        for r in timeseries.rolling_distinct(
            df, "user_id", "ts", window_days=3
        ).collect()
    }
    assert out == {"2024-01-01": 2, "2024-01-03": 2, "2024-01-09": 1}


def test_peak_concurrency_hand_case(spark):
    from pyspark.sql import functions as F

    from etl_io_spark.operators import timeseries

    # [0,10) [5,15) [10,20): peak 2, first reached at t=5; the touch at 10
    # (end before start) must not count as 3
    rows = [("k", 0, 10), ("k", 5, 15), ("k", 10, 20), ("solo", 100, 101)]
    df = spark.createDataFrame(rows, "key string, s long, e long")
    out = {r["key"]: r for r in timeseries.peak_concurrency(df, "key", "s", "e").collect()}
    k = out["k"]
    assert k["peak_concurrent"] == 2
    assert k["peak_at"].microsecond == 5
    assert out["solo"]["peak_concurrent"] == 1

"""Round-12: ADVICE hardening pins (attribution NULL type, coincident
interpolation neighbors, weighted-percentiles reserved names) plus the
round's new operators."""

import datetime

import pytest

from pyspark.sql import functions as F

from etl_io_spark.operators import aggregate as agg, timeseries, window as win


def _ts(d: int, h: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, d, h, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


# -------------------------------------------- ADVICE r11 hardening pins


def test_attribution_ignores_null_event_types(spark):
    # a NULL type is neither a conversion nor a touch: the SQL mirror's
    # WHERE event_type <> 'purchase' drops it implicitly; without the
    # explicit filter Spark credits it as a touch_type=NULL group
    clean = [
        (1, _ts(1, 1), 9, "view"),
        (2, _ts(1, 2), 9, "purchase"),
    ]
    dirty = clean + [(3, _ts(1, 1, ), 9, None), (4, _ts(1, 3), 9, None)]
    want = sorted(
        map(tuple, win.multi_touch_attribution(_events(spark, clean)).collect())
    )
    got = sorted(
        map(tuple, win.multi_touch_attribution(_events(spark, dirty)).collect())
    )
    assert got == want
    assert all(r[0] is not None for r in got)  # no NULL touch_type group


def test_interpolate_linear_coincident_neighbors_stay_null(spark):
    # duplicate (key, ts): the masked row's prev and next non-null
    # neighbors share a timestamp -> nt == pt -> division by zero.
    # Non-ANSI Spark would emit NaN/Inf with was_interpolated=True;
    # the gap is unfillable and must stay NULL on both engines.
    rows = [
        (1, _ts(1, 0), 1, 5.0),
        (2, _ts(1, 0), 1, None),  # between two obs at the SAME ts
        (3, _ts(1, 0), 1, 9.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = {
        r["event_id"]: r
        for r in timeseries.interpolate_linear(
            df, "user_id", "ts", "value", tiebreak_col="event_id"
        ).collect()
    }
    assert out[2]["value"] is None
    assert not out[2]["was_interpolated"]
    # a NORMAL gap in the same frame still fills (guard is per-row)
    rows2 = rows + [
        (4, _ts(1, 2), 1, None),  # halfway between ts0 (9.0) and ts4 (1.0)
        (5, _ts(1, 4), 1, 1.0),
    ]
    df2 = spark.createDataFrame(
        rows2, "event_id long, ts timestamp, user_id long, value double"
    )
    out2 = {
        r["event_id"]: r
        for r in timeseries.interpolate_linear(
            df2, "user_id", "ts", "value", tiebreak_col="event_id"
        ).collect()
    }
    assert out2[4]["value"] == 5.0 and out2[4]["was_interpolated"]


def test_weighted_percentiles_rejects_reserved_columns(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 2, 0)], "g string, v double, w int, __tot int"
    )
    with pytest.raises(ValueError, match="__tot"):
        agg.weighted_percentiles(df, ["g"], "v", "w", (0.5,))


# ------------------------------------------------------- BPE training


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_train_hand_computed(spark):
    from etl_io_spark.operators import training

    # corpus: "low" x5, "lower" x2 -> freqs low=5 lower=2
    # round 1 pairs: (l,o)=7 (o,w)=7 (w,e)=2 (e,r)=2 -> tie 7, lex
    #   smallest left: (l,o) merges -> lo
    # round 2: (lo,w)=7 (w,e)=2 (e,r)=2 -> (lo,w) -> low
    # round 3: (low,e)=2 (e,r)=2 -> tie 2: (e,r) < (low,e) -> er
    # round 4: (low,er)=2 -> lower
    docs = _docs(spark, ["low " * 5, "lower lower"])
    out = [
        tuple(r)
        for r in training.bpe_train(docs, "text", n_merges=4)
        .orderBy("round")
        .collect()
    ]
    assert out == [
        (1, "l", "o", 7),
        (2, "lo", "w", 7),
        (3, "e", "r", 2),
        (4, "low", "er", 2),
    ]


def test_bpe_train_overlap_greedy_and_early_stop(spark):
    from etl_io_spark.operators import training

    # "aaa": round 1 pair (a,a) count 2 -> greedy non-overlap merge
    # gives [aa, a]; round 2 merges (aa, a) -> aaa; round 3: no pairs
    # left anywhere -> early stop (2 rows despite n_merges=5)
    docs = _docs(spark, ["aaa"])
    out = [
        tuple(r)
        for r in training.bpe_train(docs, "text", n_merges=5)
        .orderBy("round")
        .collect()
    ]
    assert out == [(1, "a", "a", 2), (2, "aa", "a", 1)]


def test_bpe_train_filters_nonalpha_and_null(spark):
    from etl_io_spark.operators import training

    # tokens with digits/punct are excluded; NULL text dropped; case
    # folded ("AB ab" both count as "ab")
    docs = _docs(spark, ["AB ab", "x9 a-b", None])
    out = [
        tuple(r)
        for r in training.bpe_train(docs, "text", n_merges=2)
        .orderBy("round")
        .collect()
    ]
    assert out == [(1, "a", "b", 2)]


# --------------------------------------------- censored survival curve


def test_survival_censoring_reduces_events_not_risk(spark):
    from etl_io_spark.operators import timeseries

    # 4 users: lifetimes 0, 1, 2, 3 days; corpus max = day 10.
    # censor_gap_days=3: users whose last activity is within 3 days of
    # day 10 censor. u4 (last=day 10) and u3 (last=day 9: gap 1) and
    # u2 (last=day 8: gap 2) censor; u1 (last=day 1: gap 9) is an event.
    rows = [
        (1, _ts(1)), (1, _ts(1, 5)),          # dur 0, event
        (2, _ts(7)), (2, _ts(8)),             # dur 1, censored (gap 2)
        (3, _ts(7)), (3, _ts(9)),             # dur 2, censored (gap 1)
        (4, _ts(7)), (4, _ts(10)),            # dur 3, censored (gap 0)
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = timeseries.survival_curve(
        df, "user_id", "ts", censor_gap_days=3
    ).collect()
    # only dur=0 is an event row: d=1, n_at_risk=4 -> survival 0.75
    assert len(out) == 1
    r = out[0]
    assert r["duration_days"] == 0
    assert r["n_at_risk"] == 4
    assert r["n_events"] == 1
    assert r["survival"] == 0.75


def test_bpe_token_counts_hand_computed(spark):
    from etl_io_spark.operators import training

    # merges (lo), (lo,w): "low" -> [low] = 1 symbol, "lower" ->
    # [low, e, r] = 3, "cat" -> untouched 3 chars; "x9" filtered out
    docs = _docs(spark, ["low low lower", "cat x9", None])
    out = {
        r["doc_id"]: (r["n_words"], r["bpe_tokens"])
        for r in training.bpe_token_counts(
            docs, [("l", "o"), ("lo", "w")]
        ).collect()
    }
    assert out[0] == (3, 2 * 1 + 3)
    assert out[1] == (1, 3)
    assert 2 not in out  # NULL text contributes nothing


def test_bpe_token_counts_no_merges_counts_chars(spark):
    from etl_io_spark.operators import training

    docs = _docs(spark, ["ab abc"])
    out = training.bpe_token_counts(docs, []).collect()[0]
    assert (out["n_words"], out["bpe_tokens"]) == (2, 5)


def test_bpe_oracles_survive_merge_exhaustion(spark, tmp_path):
    """When the corpus runs out of pairs before round n (Spark breaks
    early), the unrolled oracle must carry the vocab through the empty
    rounds (LEFT JOIN ON TRUE), not empty it via a cross join — pinned
    by running BOTH engines on an exhausting corpus ("aaa": 2 merges,
    then nothing)."""
    import duckdb
    import pandas as pd

    from etl_io_spark import registry
    from etl_io_spark.operators import training

    pdf = pd.DataFrame({"doc_id": [0, 1], "text": ["aaa", "aaa aa"]})
    con = duckdb.connect()
    con.register("documents", pdf)
    docs = spark.createDataFrame(pdf)

    # merges key: oracle rows == Spark rows (early stop on both sides)
    want_m = sorted(
        map(tuple, training.bpe_train(docs, "text", n_merges=8).collect())
    )
    got_m = sorted(map(tuple, con.sql(registry._bpe_oracle_sql(8)).fetchall()))
    assert got_m == want_m and len(got_m) < 8

    # apply key: the final vocab must survive the no-op rounds
    merges = [(l, r) for _, l, r, _ in want_m]
    want_a = sorted(
        map(tuple, training.bpe_token_counts(docs, merges).collect())
    )
    got_a = sorted(
        map(tuple, con.sql(registry._bpe_apply_oracle_sql(8)).fetchall())
    )
    assert got_a == want_a
    assert len(got_a) == 2  # one row per doc, NOT an emptied chain

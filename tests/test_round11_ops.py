"""Round-11 operators: classical decomposition, multi-touch attribution,
boilerplate n-grams."""

import datetime

import pytest

from pyspark.sql import functions as F

from etl_io_spark.operators import text, timeseries, window as win


def _ts(d: int, h: int = 0) -> datetime.datetime:
    return datetime.datetime(2024, 1, d, h, 0)


# ---------------------------------------------------------------- STL


def test_stl_reconstruction_and_trim(spark):
    # 21 days, 3 events on Mondays-ish pattern: y varies; check the
    # identity y ~= trend + seasonal + resid (exact before rounding,
    # so within 3 * 0.5e-4 after the three floor-rounds)
    rows = []
    eid = 0
    for d in range(1, 22):
        n = 2 + (d % 7 == 0) * 3 + (d % 3 == 0)
        for _ in range(n):
            eid += 1
            rows.append((eid, _ts(d)))
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = timeseries.stl_decompose(df, "ts", period=7, trend_window=7)
    got = {r["day"]: r for r in out.collect()}
    # edge trim: 21 active days, window 7 -> 15 rows, days 4..18
    assert len(got) == 15
    assert min(got) == datetime.date(2024, 1, 4)
    assert max(got) == datetime.date(2024, 1, 18)
    for r in got.values():
        assert r["y"] == pytest.approx(
            r["trend"] + r["seasonal"] + r["resid"], abs=2e-4
        )


def test_stl_constant_series_flat(spark):
    rows = [(d * 10 + k, _ts(d)) for d in range(1, 15) for k in range(3)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = timeseries.stl_decompose(df, "ts", period=7, trend_window=7).collect()
    for r in out:
        assert r["trend"] == 3.0
        assert r["seasonal"] == 0.0
        assert r["resid"] == 0.0


def test_stl_rejects_even_window(spark):
    df = spark.createDataFrame([(1, _ts(1))], "event_id long, ts timestamp")
    with pytest.raises(ValueError, match="odd"):
        timeseries.stl_decompose(df, "ts", trend_window=6)


# ------------------------------------------------- multi-touch attribution


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_attribution_u_shape_hand_computed(spark):
    # user 1: 5 touches then a purchase -> first/last 0.4, middles
    # share 0.2: 2000 // 3 = 666 bp with remainder 2 -> earliest two
    # middles get 667, third 666
    rows = [(i, _ts(1, i), 1, "view") for i in range(1, 6)]
    rows.append((99, _ts(1, 7), 1, "purchase"))
    out = {
        r["touch_type"]: r
        for r in win.multi_touch_attribution(_events(spark, rows)).collect()
    }
    assert out["view"]["n_touches"] == 5
    # 4000 + 4000 + 667 + 667 + 666 = 10000
    assert out["view"]["credit"] == 1.0


def test_attribution_split_by_type_and_counts(spark):
    # touches: view, click, view -> purchase. order: v(1h) c(2h) v(3h)
    # first v: 4000, middle c: 2000, last v: 4000
    rows = [
        (1, _ts(1, 1), 1, "view"),
        (2, _ts(1, 2), 1, "click"),
        (3, _ts(1, 3), 1, "view"),
        (9, _ts(1, 5), 1, "purchase"),
    ]
    out = {
        r["touch_type"]: r
        for r in win.multi_touch_attribution(_events(spark, rows)).collect()
    }
    assert out["view"]["credit"] == 0.8
    assert out["click"]["credit"] == 0.2


def test_attribution_lone_and_pair(spark):
    rows = [
        (1, _ts(1, 1), 1, "view"),
        (9, _ts(1, 2), 1, "purchase"),  # lone touch: 1.0
        (2, _ts(2, 1), 2, "click"),
        (3, _ts(2, 2), 2, "view"),
        (8, _ts(2, 3), 2, "purchase"),  # pair: 0.5 each
    ]
    out = {
        r["touch_type"]: r["credit"]
        for r in win.multi_touch_attribution(_events(spark, rows)).collect()
    }
    assert out["view"] == 1.5
    assert out["click"] == 0.5


def test_attribution_lookback_cutoff_and_orphans(spark):
    rows = [
        (1, _ts(1), 1, "view"),  # 10 days before purchase: outside 7d
        (2, _ts(10), 1, "click"),  # inside
        (9, _ts(11), 1, "purchase"),
        (3, _ts(20), 2, "view"),  # no purchase at all
    ]
    out = {
        r["touch_type"]: r
        for r in win.multi_touch_attribution(_events(spark, rows)).collect()
    }
    assert set(out) == {"click"}
    assert out["click"]["credit"] == 1.0


def test_attribution_credit_conserved(spark):
    # total credit == number of credited conversions, whatever the mix
    rows = []
    eid = 0
    for u in range(1, 8):
        for k in range(u - 1):  # u-1 touches then purchase
            eid += 1
            rows.append((eid, _ts(1, k), u, "view" if k % 2 else "click"))
        eid += 1
        rows.append((eid, _ts(2), u, "purchase"))
    # user 1 contributes 0 touches -> uncredited conversion
    out = win.multi_touch_attribution(_events(spark, rows)).agg(
        F.sum("credit").alias("s")
    ).collect()[0]
    assert out["s"] == 6.0


# ------------------------------------------------------ boilerplate n-grams


def test_boilerplate_doc_frequency_counts_docs_once(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick fox the quick fox"),  # gram repeats in-doc
            (2, "the quick fox jumps"),
            (3, "a b"),  # too short for trigram
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {
        r["gram"]: r["doc_freq"]
        for r in text.boilerplate_ngrams(df, top_k=10).collect()
    }
    assert out["the quick fox"] == 2  # doc 1 counts once
    assert out["quick fox the"] == 1
    assert "a b" not in out


def test_boilerplate_topk_deterministic_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "z y x"), (2, "a b c"), (3, "m n o")],
        "doc_id long, text string",
    )
    out = text.boilerplate_ngrams(df, top_k=2).collect()
    # all doc_freq 1: gram ascending wins the cut
    assert [r["gram"] for r in out] == ["a b c", "m n o"]


# --------------------------------------------- r11 self-review NULL pins


def test_stl_ignores_null_timestamps(spark):
    rows = [(d * 10 + k, _ts(d)) for d in range(1, 15) for k in range(3)]
    clean = spark.createDataFrame(rows, "event_id long, ts timestamp")
    dirty = spark.createDataFrame(
        rows + [(999, None)], "event_id long, ts timestamp"
    )
    want = sorted(map(tuple, timeseries.stl_decompose(clean, "ts").collect()))
    got = sorted(map(tuple, timeseries.stl_decompose(dirty, "ts").collect()))
    assert got == want


def test_rolling_distinct_ignores_null_key_and_ts(spark):
    clean = spark.createDataFrame(
        [(1, _ts(1)), (2, _ts(1)), (1, _ts(3))], "user_id long, ts timestamp"
    )
    dirty = spark.createDataFrame(
        [(1, _ts(1)), (2, _ts(1)), (1, _ts(3)), (None, _ts(1)), (7, None)],
        "user_id long, ts timestamp",
    )
    want = sorted(
        map(tuple, timeseries.rolling_distinct(clean, "user_id", "ts").collect())
    )
    got = sorted(
        map(tuple, timeseries.rolling_distinct(dirty, "user_id", "ts").collect())
    )
    assert got == want
    assert all(r[0] is not None for r in got)  # no fabricated NULL day


def test_attribution_ignores_null_users(spark):
    rows = [
        (3, _ts(1, 1), 9, "view"),
        (4, _ts(1, 2), 9, "purchase"),
        (1, _ts(1, 1), None, "view"),  # NULL user: never matches in SQL
        (2, _ts(1, 2), None, "purchase"),
    ]
    out = {
        r["touch_type"]: r["credit"]
        for r in win.multi_touch_attribution(_events(spark, rows)).collect()
    }
    assert out == {"view": 1.0}


def test_weighted_percentiles_non_numeric_value_falls_back(spark):
    import datetime as dt

    from etl_io_spark.operators import aggregate as agg

    df = spark.createDataFrame(
        [("g", dt.date(2024, 1, 1), 1), ("g", dt.date(2024, 1, 5), 3)],
        "g string, v date, w int",
    )
    # default n_buckets must not crash on an orderable-but-non-numeric
    # value column: silent fallback to the single-window plan
    row = agg.weighted_percentiles(df, ["g"], "v", "w", (0.5,)).collect()[0]
    assert row["wp50"] == dt.date(2024, 1, 5)  # cum 1 < 2 -> next value


def test_asof_join_rejects_suffix_collision(spark):
    from etl_io_spark.operators import joins

    left = spark.createDataFrame(
        [(1, _ts(1), 0.0)], "k int, ts timestamp, v_asof double"
    )
    right = spark.createDataFrame(
        [(1, _ts(1), 1.0)], "k int, ts timestamp, v double"
    )
    with pytest.raises(ValueError, match="v_asof"):
        joins.asof_join(left, right, on="k", right_cols=["v"])


def test_boilerplate_counts_distinct_doc_ids(spark):
    # the same doc_id split across rows still counts once per gram
    df = spark.createDataFrame(
        [(1, "the quick fox"), (1, "the quick fox jumps"), (2, "the quick fox")],
        "doc_id long, text string",
    )
    out = {
        r["gram"]: r["doc_freq"]
        for r in text.boilerplate_ngrams(df, top_k=10).collect()
    }
    assert out["the quick fox"] == 2


# ------------------------------------------- boilerplate density + KM


def test_boilerplate_density_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),  # grams: abg, bgd
            (2, "alpha beta gamma"),  # gram: abg (shared with 1)
            (3, "x y z w"),  # grams unique to doc 3
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in text.boilerplate_density(df, min_df=2).collect()
    }
    assert out[1]["n_grams"] == 2
    assert out[1]["boiler_frac"] == 0.5  # abg shared, bgd unique
    assert out[2]["boiler_frac"] == 1.0
    assert out[3]["boiler_frac"] == 0.0


def test_boilerplate_density_multirow_doc_counts_once(spark):
    # the same doc_id on two rows must not inflate its own grams into
    # "boilerplate" via self-matching
    df = spark.createDataFrame(
        [(1, "p q r"), (1, "p q r"), (2, "a b c")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["boiler_frac"]
        for r in text.boilerplate_density(df, min_df=2).collect()
    }
    assert out[1] == 0.0  # one distinct doc -> gdf 1 < 2
    assert out[2] == 0.0


def test_survival_curve_hand_computed(spark):
    rows = [
        (1, _ts(1)),  # u1: dur 0, event
        (2, _ts(1)), (2, _ts(3)),  # u2: dur 2, event
        (3, _ts(2)), (3, _ts(4)),  # u3: dur 2, event
        (4, _ts(1)), (4, _ts(19)),  # u4: dur 18, censored (gap 0 < 3)
        (5, None),  # NULL ts: excluded
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        r["duration_days"]: r
        for r in timeseries.survival_curve(
            df, "user_id", "ts", censor_gap_days=3
        ).collect()
    }
    # corpus max = day 20... actually day 19; u4 gap = 0 -> censored
    assert set(out) == {0, 2}
    assert out[0]["n_at_risk"] == 4 and out[0]["n_events"] == 1
    assert out[0]["survival"] == 0.75
    assert out[2]["n_at_risk"] == 3 and out[2]["n_events"] == 2
    # 3/4 * (1 - 2/3) = 0.25
    assert out[2]["survival"] == 0.25


def test_survival_curve_all_censored_empty(spark):
    # u1 last day 10 (gap 0), u2 last day 9 (gap 1) — both inside the
    # 5-day censor window, so there are no churn events to estimate
    df = spark.createDataFrame(
        [(1, _ts(1)), (1, _ts(10)), (2, _ts(9))], "user_id long, ts timestamp"
    )
    out = timeseries.survival_curve(df, "user_id", "ts", censor_gap_days=5)
    assert out.count() == 0


def test_survival_curve_terminal_bucket_reaches_zero(spark):
    # everyone at risk at the max duration churns: log(0) must not be
    # silently dropped (Spark non-ANSI log(0) = NULL, window SUM skips
    # NULLs -> survival would read ~1.0); the explicit -inf term pins
    # the exact 0.0 (r11 review catch)
    rows = [
        (1, _ts(1)), (1, _ts(6)),  # dur 5, churned
        (2, _ts(2)), (2, _ts(7)),  # dur 5, churned
        (3, _ts(20)),  # keeps corpus max at day 20 -> 1&2 gaps >= 3
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        r["duration_days"]: r
        for r in timeseries.survival_curve(
            df, "user_id", "ts", censor_gap_days=3
        ).collect()
    }
    # u3 dur 0 gap 0: censored. At dur 5: n_at_risk 2, d 2 -> S = 0.0
    assert out[5]["n_events"] == 2 and out[5]["n_at_risk"] == 2
    assert out[5]["survival"] == 0.0


def test_boilerplate_family_ignores_null_doc_ids(spark):
    clean = spark.createDataFrame(
        [(1, "p q r"), (2, "p q r")], "doc_id long, text string"
    )
    dirty = spark.createDataFrame(
        [(1, "p q r"), (2, "p q r"), (None, "p q r"), (None, "x y z")],
        "doc_id long, text string",
    )
    for fn in (
        lambda d: text.boilerplate_ngrams(d, top_k=10),
        lambda d: text.boilerplate_density(d, min_df=2),
    ):
        want = sorted(map(tuple, fn(clean).collect()))
        got = sorted(map(tuple, fn(dirty).collect()))
        assert got == want


# --------------------------------------------------- linear interpolation


def test_interpolate_linear_hand_computed(spark):
    rows = [
        (1, _ts(1, 0), 1, 10.0),
        (2, _ts(1, 2), 1, None),  # 2h of 4h gap: 10 + 0.5*(30-10) = 20
        (3, _ts(1, 4), 1, 30.0),
        (4, _ts(1, 6), 1, None),  # trailing: no next -> stays NULL
        (5, _ts(2, 0), 2, None),  # leading: no prev -> stays NULL
        (6, _ts(2, 1), 2, 7.0),
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
    assert out[2]["value"] == 20.0 and out[2]["was_interpolated"]
    assert out[1]["value"] == 10.0 and not out[1]["was_interpolated"]
    assert out[4]["value"] is None and not out[4]["was_interpolated"]
    assert out[5]["value"] is None and not out[5]["was_interpolated"]


def test_interpolate_linear_uneven_spacing(spark):
    # 1h then 3h to the next observation: weight is time, not rows
    rows = [
        (1, _ts(1, 0), 1, 0.0),
        (2, _ts(1, 1), 1, None),  # 1/4 of the way: 0 + 0.25*8 = 2.0
        (3, _ts(1, 4), 1, 8.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    out = {
        r["event_id"]: r["value"]
        for r in timeseries.interpolate_linear(
            df, "user_id", "ts", "value", tiebreak_col="event_id"
        ).collect()
    }
    assert out[2] == 2.0


# ----------------------------------------------------- water-fill mixture


def test_mixture_waterfill_invariants(spark):
    import random

    from etl_io_spark.operators import training

    random.seed(7)
    for _ in range(4):
        n = random.randint(1, 6)
        rows, weights = [], {}
        for i in range(n):
            toks = random.randint(0, 50)
            rows.append((i, f"g{i}", " ".join(["w"] * toks)))
            weights[f"g{i}"] = random.choice([0, 500, 1000, 2500, 5000])
        budget = random.randint(0, 300)
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        out = {
            r["lang"]: r
            for r in training.mixture_waterfill(
                df, "lang", "text", weights, budget, max_epochs_bp=20000
            ).collect()
        }
        # exact partition of min(budget, total weighted capacity)
        cap_w = sum(r["cap_tokens"] for r in out.values() if r["weight_bp"] > 0)
        assert sum(r["planned_tokens"] for r in out.values()) == min(
            budget, cap_w
        )
        for r in out.values():
            assert 0 <= r["planned_tokens"] <= r["cap_tokens"]
            if r["weight_bp"] == 0:
                assert r["planned_tokens"] == 0
        # water level: unsaturated allocations proportional within 1 token
        uns = [r for r in out.values() if not r["saturated"] and r["weight_bp"] > 0]
        if len(uns) >= 2:
            lam = [r["planned_tokens"] / r["weight_bp"] for r in uns]
            assert max(lam) - min(lam) <= 1.0 / min(
                r["weight_bp"] for r in uns
            ) + 1e-12


def test_mixture_waterfill_redistributes_deficit(spark):
    from etl_io_spark.operators import training

    # a: cap 4 (saturates under equal weights), b: plenty -> b absorbs
    # a's deficit: 4 + 16 = 20
    df = spark.createDataFrame(
        [(1, "a", "w w"), (2, "b", " ".join(["w"] * 40))],
        "doc_id long, lang string, text string",
    )
    out = {
        r["lang"]: r
        for r in training.mixture_waterfill(
            df, "lang", "text", {"a": 5000, "b": 5000}, 20,
            max_epochs_bp=20000,
        ).collect()
    }
    assert out["a"]["saturated"] and out["a"]["planned_tokens"] == 4
    assert not out["b"]["saturated"] and out["b"]["planned_tokens"] == 16

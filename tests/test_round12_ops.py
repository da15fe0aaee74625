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

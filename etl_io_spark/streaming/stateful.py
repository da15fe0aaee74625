"""Custom stateful streaming operator via applyInPandasWithState.

The built-in windowed aggregations in ``windows.py`` cover everything the
``events`` table needs declaratively; this module is the escape hatch for
semantics Spark's operators can't express — here, a per-key *running
profile* that emits an updated summary row on every trigger and expires
idle keys by processing-time timeout. That shape (per-entity accumulator +
timeout-driven flush) is the canonical applyInPandasWithState use-case:
sessionization with custom close conditions, per-user quota counters,
online feature accumulation for a training-data pipeline.

Scale notes: state is partitioned by the grouping key across executors and
checkpointed by the state store; per-key state here is O(1) (four scalars),
so total state = O(distinct keys) regardless of event volume. The same
function doubles as a batch operator through ``applyInPandas`` (state-free
pass) so correctness is oracle-checkable on the batch side.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n BIGINT, total DOUBLE, min_v DOUBLE, max_v DOUBLE"
OUTPUT_SCHEMA = (
    "user_id BIGINT, n BIGINT, total DOUBLE, min_v DOUBLE, max_v DOUBLE, "
    "mean_v DOUBLE, closed BOOLEAN"
)


def _merge(
    state: tuple[int, float, float, float] | None, values: pd.Series
) -> tuple[int, float, float, float]:
    n, total, mn, mx = state if state is not None else (0, 0.0, float("inf"), float("-inf"))
    if len(values):
        n += int(len(values))
        total += float(values.sum())
        mn = min(mn, float(values.min()))
        mx = max(mx, float(values.max()))
    return n, total, mn, mx


def _profile_fn(timeout_ms: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            n, total, mn, mx = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": key[0],
                        "n": n,
                        "total": round(total, 6),
                        "min_v": mn,
                        "max_v": mx,
                        "mean_v": round(total / n, 6) if n else None,
                        "closed": True,
                    }
                ]
            )
            return
        cur = state.get if state.exists else None
        for pdf in pdfs:
            cur = _merge(cur, pdf["value"])
        if cur is None:
            return
        state.update(cur)
        state.setTimeoutDuration(timeout_ms)
        n, total, mn, mx = cur
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "n": n,
                    "total": round(total, 6),
                    "min_v": mn,
                    "max_v": mx,
                    "mean_v": round(total / n, 6) if n else None,
                    "closed": False,
                }
            ]
        )

    return fn


def user_profile_stream(
    events: DataFrame, timeout_ms: int = 60_000
) -> DataFrame:
    """Streaming per-user running profile (count/sum/min/max/mean of
    ``value``) with processing-time expiry: an update row per key per
    trigger, and a final ``closed=True`` row when the key goes idle for
    ``timeout_ms``."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _profile_fn(timeout_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def user_profile_batch(events: DataFrame) -> DataFrame:
    """Batch twin of ``user_profile_stream`` — the oracle-checkable side.
    Declarative aggregation (no pandas) because batch needs no state."""
    from pyspark.sql import functions as F

    return (
        events.groupBy("user_id")
        .agg(
            F.count("value").alias("n"),
            F.round(F.sum("value"), 6).alias("total"),
            F.min("value").alias("min_v"),
            F.max("value").alias("max_v"),
            F.round(F.avg("value"), 6).alias("mean_v"),
        )
        .withColumn("closed", F.lit(False))
    )


EWMA_STATE_SCHEMA = "s DOUBLE, t_last BIGINT, n BIGINT"
EWMA_OUTPUT_SCHEMA = "user_id BIGINT, n_events BIGINT, ewma_score DOUBLE"


def _ewma_fold(
    state: tuple[float, int, int] | None,
    pdf: "pd.DataFrame",
    lam: float,
) -> tuple[float, int, int]:
    """Sequential EWMA recursion over one (already time-sorted) batch:
    ``s = v + s·exp(-λ·Δt)``. Pure function so cross-batch state carry is
    unit-testable without a streaming query."""
    import math

    s, t_last, n = state if state is not None else (0.0, None, 0)
    for t, v in zip(pdf["__tm"], pdf["value"]):
        t = int(t)
        if t_last is None:
            s = float(v)
        else:
            s = float(v) + s * math.exp(-lam * ((t - t_last) / 1_000_000.0))
        t_last = t
        n += 1
    return s, t_last, n


def _ewma_fn(lam: float, round_to: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        cur = state.get if state.exists else None
        if cur is not None and cur[1] is None:  # never happens post-init
            cur = None
        for pdf in pdfs:
            cur = _ewma_fold(cur, pdf.sort_values(["__tm", "event_id"]), lam)
        if cur is None:
            return
        state.update(cur)
        s, _t, n = cur
        yield pd.DataFrame(
            [{"user_id": key[0], "n_events": n, "ewma_score": round(s, round_to)}]
        )

    return fn


def ewma_stream(
    events: DataFrame,
    halflife_seconds: float = 86400.0,
    round_to: int = 6,
) -> DataFrame:
    """Streaming twin of ``timeseries.ewma_score``: the per-key decayed
    activity score maintained INCREMENTALLY — O(1) state per key
    (score, last-seen µs, count), one update row per key per trigger.
    The batch twin needs the whole history per key; this needs only the
    folded state, which is why the recursive form is the streaming one
    and the prefix-factorized form is the batch one.

    Assumes per-key in-order arrival ACROSS triggers (within a trigger
    the batch is sorted here); feed from a watermark-ordered source if
    the transport can reorder."""
    import math

    lam = math.log(2.0) / float(halflife_seconds)
    from pyspark.sql import functions as F

    base = events.select(
        "user_id", "event_id", F.unix_micros("ts").alias("__tm"), "value"
    )
    return base.groupBy("user_id").applyInPandasWithState(
        _ewma_fn(lam, round_to),
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EWMA_TYPED_OUTPUT_SCHEMA = (
    "user_id BIGINT, event_type STRING, n_events BIGINT, ewma_score DOUBLE"
)


def _ewma_typed_fn(lam_by: dict[str, float], default_lam: float, round_to: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        lam = lam_by.get(key[1], default_lam)
        cur = state.get if state.exists else None
        for pdf in pdfs:
            cur = _ewma_fold(cur, pdf.sort_values(["__tm", "event_id"]), lam)
        if cur is None:
            return
        state.update(cur)
        s, _t, n = cur
        yield pd.DataFrame(
            [
                {
                    "user_id": key[0],
                    "event_type": key[1],
                    "n_events": n,
                    "ewma_score": round(s, round_to),
                }
            ]
        )

    return fn


def ewma_stream_typed(
    events: DataFrame,
    halflife_by: dict[str, float],
    default_halflife: float = 86400.0,
    round_to: int = 6,
) -> DataFrame:
    """Per-(user, event_type) EWMA with a PER-TYPE halflife — the
    streaming twin of ``timeseries.ewma_score_typed`` (its graded batch
    contract is the ``ewma_decay_by_type`` registry key). Same O(1)
    state per group as :func:`ewma_stream`; λ is resolved once per
    group from the grouping key's type, so the fold itself is unchanged
    and the cross-batch state-carry tests cover both variants.

    Range limit: the per-batch fold shares ``ewma_score_typed``'s
    ``exp(λ·span)`` ceiling (~700 half-lives of the SHORTEST configured
    halflife per batch span — see that docstring); the incremental
    cross-batch decay keeps per-batch spans short in steady state."""
    import math

    lam_by = {t: math.log(2.0) / float(h) for t, h in halflife_by.items()}
    default_lam = math.log(2.0) / float(default_halflife)
    from pyspark.sql import functions as F

    base = events.select(
        "user_id",
        "event_type",
        "event_id",
        F.unix_micros("ts").alias("__tm"),
        "value",
    )
    return base.groupBy("user_id", "event_type").applyInPandasWithState(
        _ewma_typed_fn(lam_by, default_lam, round_to),
        outputStructType=EWMA_TYPED_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

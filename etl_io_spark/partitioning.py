"""Partition-spread helper for compute-heavy map stages.

Motivation (scale): Spark parallelizes a parquet scan by file splits, and a
split can't be finer than a row group. A big table written as few row
groups therefore scans as few tasks — and any CPU-heavy map chained onto
that scan (md5 shingling, regex extraction, embedding arithmetic, pandas
UDFs) underuses the cluster no matter how many cores exist.

``spread`` fixes exactly that regime and nothing else:

  * tiny input (the common local-test case): the gate ``size <
    min_bytes_per_partition`` short-circuits to a no-op. Adding an
    exchange + AQE stage + (for pandas UDFs) a fleet of cold Python
    workers costs far more than single-task execution of sub-MiB data —
    measured 2-8x slower on the sf0.1 bench when spread unconditionally.
  * starved middle regime (hundreds of MiB in a handful of row groups):
    inserts a round-robin repartition sized so every partition gets at
    least ``min_bytes_per_partition``, capped at defaultParallelism. The
    shuffle moves the raw input once; the downstream map is 10-100x the
    input, so a few percent of cost buys core-count speedup.
  * 100 TB: scans already have >= core-count splits; the partition-count
    probe says so and spread is a no-op (never shrinks, never reshuffles
    spread data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: floor on useful work per added partition; below this, exchange + task
#: scheduling overhead exceeds the parallelism gain for any map we ship.
MIN_BYTES_PER_PARTITION = 8 * 1024 * 1024

#: Catalyst reports sizeInBytes = 8 EiB-ish defaults when stats are
#: unknown; treat anything above this as "unknown, fall through to the
#: partition-count probe" instead of trusting it.
_UNKNOWN_SIZE = 1 << 60


def shuffle_parallelism(df: DataFrame) -> int:
    """``spark.sql.shuffle.partitions`` as an int, tolerating non-numeric
    values — some distributions set it to ``auto`` (Databricks AQE), which
    would make a bare ``int(conf.get(...))`` raise at plan-construction
    time (ADVICE r6). Falls back to the cluster's defaultParallelism."""
    raw = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    try:
        return int(raw)
    except (TypeError, ValueError):
        return df.sparkSession.sparkContext.defaultParallelism


def plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the optimized plan (file size for bare
    scans; propagated estimates above)."""
    return int(str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()))


def leaf_scan_bytes(df: DataFrame) -> int:
    """Summed Catalyst size of the optimized plan's LEAVES — i.e. the
    bytes the plan actually reads, before join/project inflation.

    ``plan_size_bytes`` on a post-join plan is useless as a scale gate:
    join estimates multiply (measured 20 GiB for a 97k-row edge relation
    at sf0.01). Leaf stats are file-accurate for parquet scans and
    row-accurate for local/cached relations, so "how much source does
    this plan consume" is the honest no-job proxy for its scale regime.
    A leaf with an unknown estimate (Catalyst's 8 EiB-class default)
    makes the whole result unknown-large — callers gating a
    scale-protective choice (persist, checkpoint) should then take the
    protective branch."""
    leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
    total = 0
    for i in range(leaves.size()):
        total += int(str(leaves.apply(i).stats().sizeInBytes()))
    return total


_SIZE_SUFFIXES = {"k": 1024, "m": 1024**2, "g": 1024**3, "t": 1024**4}


def broadcast_budget_bytes(df: DataFrame) -> int:
    """The session's ``spark.sql.autoBroadcastJoinThreshold`` in bytes —
    the budget a plan-construction-time broadcast decision should honor.
    Tolerates the suffixed forms the conf accepts (``10MB``, ``64m``) and
    returns 0 when auto-broadcast is disabled (``-1``) or unparsable, so
    callers gate conservatively."""
    raw = str(
        df.sparkSession.conf.get(
            "spark.sql.autoBroadcastJoinThreshold", "10485760"
        )
    ).strip().lower().removesuffix("b")
    mult = 1
    if raw and raw[-1] in _SIZE_SUFFIXES:
        mult = _SIZE_SUFFIXES[raw[-1]]
        raw = raw[:-1]
    try:
        return max(0, int(raw) * mult)
    except (TypeError, ValueError):
        return 0


def spread_small(
    df: DataFrame,
    gate: DataFrame | None = None,
    min_bytes_per_partition: int = MIN_BYTES_PER_PARTITION,
    max_bytes: int = 1 << 30,
) -> DataFrame:
    """Round-robin repartition for SMALL relations feeding CPU-heavy
    map-side work, computed WITHOUT :func:`spread`'s ``.rdd`` partition
    probe — that probe converts the plan to an RDD, and under AQE the
    conversion EXECUTES every upstream query stage as driver-synchronized
    jobs at plan-construction time (the localCheckpoint class; harmless
    on scan-only plans, a lazy-construction violation over cached
    multi-exchange plans — caught by
    tests/test_plans.py::test_registry_construction_is_lazy, r12-opt).

    Sizing gates on ``leaf_scan_bytes`` of ``gate`` (default ``df``) —
    pass the operator's ORIGINAL source relation as ``gate`` when ``df``
    sits over joins/caches whose Catalyst estimates inflate. At or above
    ``max_bytes`` (and on unknown stats, which read huge) this is a
    strict no-op: a scale-regime relation already carries parallelism,
    and an unconditional repartition there would be a wasted full
    shuffle."""
    src = gate if gate is not None else df
    sz = leaf_scan_bytes(src)
    if sz >= max_bytes:
        return df
    target = min(
        df.sparkSession.sparkContext.defaultParallelism,
        max(1, sz // min_bytes_per_partition),
    )
    if target <= 1:
        return df
    return df.repartition(target)


def pin_keyed(
    df: DataFrame,
    cols,
    gate: DataFrame | None = None,
    max_bytes: int = 1 << 30,
) -> DataFrame:
    """Explicit-count KEYED repartition ahead of a window/groupBy keyed on
    ``cols`` (or a superset-compatible key): the pinned exchange satisfies
    the downstream clustering requirement, so it SUBSTITUTES for the
    operator's own exchange at identical shuffle volume — while being
    exempt from AQE partition coalescing, which at small shuffle sizes
    collapses CPU-heavy window stages (sorts + frame aggregates) onto a
    handful of tasks (the 1 MiB ``minPartitionSize`` floor: a ~2 MiB
    events shuffle coalesces to 2 partitions regardless of cores).

    Strict no-op at or above ``max_bytes`` of source leaves (and on
    unknown stats, which read huge): in the scale regime AQE's
    byte-sizing already yields full parallelism and a pinned conf-sized
    count would fight it. Probe-free (``leaf_scan_bytes``), so plan
    construction stays lazy."""
    from pyspark.sql import functions as F

    src = gate if gate is not None else df
    if leaf_scan_bytes(src) >= max_bytes:
        return df
    return df.repartition(
        shuffle_parallelism(df), *[F.col(c) for c in cols]
    )


def spread(
    df: DataFrame,
    min_partitions: int | None = None,
    min_bytes_per_partition: int = MIN_BYTES_PER_PARTITION,
) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default: the context's
    defaultParallelism) ahead of a compute-heavy map — but only when the
    input is big enough that each added partition earns its keep, and the
    plan isn't already at least that parallel."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    size = plan_size_bytes(df)
    if size < _UNKNOWN_SIZE:
        target = min(target, max(1, size // min_bytes_per_partition))
    if target <= 1:
        return df
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)

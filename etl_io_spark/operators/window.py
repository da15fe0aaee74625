"""Window / ranking operators (SURVEY.md §2.7 — absent from the reference,
required for capability-parity-plus).

All are thin wrappers over ``pyspark.sql.Window``: one shuffle on the
partition keys, sort within partitions, no driver involvement. Ordering
columns should include a unique tiebreaker (we require it for top-k) so
results are deterministic — essential for oracle parity and for reproducible
pipelines at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def top_k_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int,
    rank_alias: str = "rn",
) -> DataFrame:
    """Top-k rows per group via ``row_number`` over a window.

    ``order_by`` must be deterministic (include a unique tiebreaker).
    Spark evaluates this with a single hash shuffle on the group keys and
    a per-partition sort; with AQE, skewed groups split automatically.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_alias, F.row_number().over(w))
        .where(F.col(rank_alias) <= k)
    )


def running_agg(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    col: str,
    alias: str,
    fn=F.sum,
) -> DataFrame:
    """Running aggregate (cumulative sum by default) within each group."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, fn(col).over(w))


def lag_lead(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column | str],
    col: str,
    offset: int = 1,
    alias: str | None = None,
) -> DataFrame:
    """lag (offset>0) / lead (offset<0) within each group."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    fn = F.lag(col, offset) if offset > 0 else F.lead(col, -offset)
    return df.withColumn(alias or f"{col}_lag{offset}", fn.over(w))

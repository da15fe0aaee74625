"""Data profiling + data-quality operators (engine extension; the
reference's only "validation" is try/except + print — SURVEY.md §5).

``profile_columns`` is the one-pass column profiler every ETL engine
ships: per-column row/null/distinct counts plus numeric moments, computed
as a SINGLE aggregate over one scan (not one job per column, which at
100 TB would re-read the table per metric) and unpivoted map-side into
the canonical long (column, metric, value) shape.

``dq_checks`` composes the standard integrity checks — duplicate keys,
null keys, referential orphans, domain violations — each a count-shaped
aggregate; the union is a plan of independent small aggregates that AQE
schedules together; none is more than one shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def profile_columns(
    df: DataFrame,
    numeric_cols: Sequence[str],
    other_cols: Sequence[str] = (),
    round_to: int = 6,
) -> DataFrame:
    """One-pass long-form profile: for numeric columns emit
    n / n_null / n_distinct / min / max / mean / stddev; for other
    columns the three counts. Exact everywhere (countDistinct, not the
    HLL approximation) so a SQL oracle reproduces it bit-for-bit; switch
    to ``approx_count_distinct`` at extreme cardinalities.

    Plan: one aggregate produces every metric as a column (distinct
    counts expand to Spark's standard expand-node plan), then a
    ``stack`` unpivot emits the long rows — map-side, no second pass.
    """
    aggs: list[Column] = []
    stack_parts: list[str] = []
    for c in numeric_cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            F.round(F.min(c).cast("double"), round_to).alias(f"__min_{c}"),
            F.round(F.max(c).cast("double"), round_to).alias(f"__max_{c}"),
            F.round(F.avg(c), round_to).alias(f"__avg_{c}"),
            F.round(F.stddev_samp(c), round_to).alias(f"__std_{c}"),
        ]
        for m, pre in [
            ("n", "__n_"),
            ("n_null", "__nn_"),
            ("n_distinct", "__nd_"),
            ("min", "__min_"),
            ("max", "__max_"),
            ("mean", "__avg_"),
            ("stddev", "__std_"),
        ]:
            stack_parts.append(f"'{c}', '{m}', CAST(`{pre}{c}` AS DOUBLE)")
    for c in other_cols:
        aggs += [
            F.count(F.lit(1)).alias(f"__n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
        ]
        for m, pre in [("n", "__n_"), ("n_null", "__nn_"), ("n_distinct", "__nd_")]:
            stack_parts.append(f"'{c}', '{m}', CAST(`{pre}{c}` AS DOUBLE)")
    # r13-opt (VERDICT r12 ask #6): the distinct counts used to be
    # countDistinct expressions INSIDE the one aggregate, which plans as
    # an Expand node multiplying the scanned row stream by
    # (1 + number of distinct columns) before the partial aggregation.
    # Each distinct count is instead its own pruned one-column leg —
    # a two-level aggregate (map-side value dedup, exchange of distinct
    # values, final non-null count) crossJoined back into the 1-row wide
    # frame as a broadcast. Same exact semantics (COUNT(DISTINCT c)
    # skips NULLs; the grouped leg keeps a NULL row that count(c)
    # skips); the moments aggregate now scans each row once, not
    # 1 + n_distinct_cols times.
    wide = df.agg(*aggs)
    for c in [*numeric_cols, *other_cols]:
        nd = (
            df.select(c)
            .distinct()
            .agg(F.count(c).cast("long").alias(f"__nd_{c}"))
        )
        wide = wide.crossJoin(F.broadcast(nd))
    n = len(stack_parts)
    return wide.select(
        F.expr(
            f"stack({n}, " + ", ".join(stack_parts) + ") AS (column, metric, value)"
        )
    )


def dq_checks(
    fact: DataFrame,
    fact_key: str,
    parent: DataFrame,
    parent_key: str,
    unique_df: DataFrame,
    unique_key: str,
    domain_checks: Sequence[tuple[str, Column]] = (),
) -> DataFrame:
    """Standard integrity suite → one row per check: ``(check, n_bad)``.

      * ``orphan_fact``    — fact rows whose key has no parent (left_anti;
                             plans as a broadcast/shuffled anti join, the
                             exact dual of referential integrity).
      * ``dup_key``        — parent-side keys appearing more than once
                             (one partial-agg shuffle on the key).
      * ``null_key``       — null fact foreign keys (pure map + count).
      * ``domain_checks``  — (name, boolean Column) predicates counted
                             where VIOLATED (pure map + count each).

    Every check is a 1-row aggregate; the union is driver-cheap and each
    leg is independently AQE-planned. At 100 TB the anti join is the only
    data-sized leg and it shuffles at most the fact keys."""
    legs = [
        # orphan = NON-NULL key with no parent; null keys are their own
        # check below (an unfiltered anti join would double-count them)
        fact.where(F.col(fact_key).isNotNull())
        .join(
            parent.select(parent_key), fact[fact_key] == parent[parent_key], "left_anti"
        )
        .agg(F.lit("orphan_fact").alias("check"), F.count(F.lit(1)).alias("n_bad")),
        unique_df.groupBy(unique_key)
        .agg(F.count(F.lit(1)).alias("__c"))
        .where(F.col("__c") > 1)
        .agg(F.lit("dup_key").alias("check"), F.count(F.lit(1)).alias("n_bad")),
        fact.where(F.col(fact_key).isNull()).agg(
            F.lit("null_key").alias("check"), F.count(F.lit(1)).alias("n_bad")
        ),
    ]
    for name, ok in domain_checks:
        legs.append(
            fact.where(~ok).agg(
                F.lit(name).alias("check"), F.count(F.lit(1)).alias("n_bad")
            )
        )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out


def key_skew(
    df: DataFrame,
    key: str,
    top: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Join/shuffle-key skew diagnostic: the ``top`` heaviest key values
    with their row share and a skew ratio (count / mean-count-per-key).

    The pre-flight check before any big shuffle — a ratio far above 1
    says the key needs salting or an AQE skew-join; finding that out here
    costs one partial-aggregated count, not a failed 100 TB join. One
    groupBy shuffle + a broadcast 1-row total + TakeOrdered top-k."""
    counts = df.groupBy(F.col(key).cast("string").alias("key_value")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    totals = counts.agg(
        F.sum("cnt").alias("__total"), F.count(F.lit(1)).alias("__nkeys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "key_value",
            "cnt",
            F.round(F.col("cnt") / F.col("__total"), round_to).alias("share"),
            F.round(
                F.col("cnt") * F.col("__nkeys") / F.col("__total"), round_to
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("cnt"), "key_value")
        .limit(top)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols,
    compare_cols,
) -> DataFrame:
    """Snapshot reconciliation: one full-outer join on the key classifies
    every row as added / removed / changed / unchanged and returns the
    four counts in ONE row — the validation step after any CDC apply or
    backfill (``table_checksum`` says *whether* two snapshots differ;
    this says *how*).

    Values are compared with null-safe EQUALITY on the native types
    (never via string rendering, whose float formatting differs across
    engines); the join is keyed, the classification map-side, and the
    final count is a four-cell aggregate.
    """
    keys = list(key_cols)
    # presence flags are literal sentinels (compare columns may be
    # legitimately NULL in a present row)
    o = old.select(
        *keys,
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(True).alias("__in_o"),
    )
    n = new.select(
        *keys,
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(True).alias("__in_n"),
    )
    j = o.join(n, keys, "full_outer")
    same = None
    for c in compare_cols:
        eq = F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
        same = eq if same is None else (same & eq)
    status = (
        F.when(F.col("__in_o").isNull(), F.lit("added"))
        .when(F.col("__in_n").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.select(status.alias("__st"))
        .groupBy()
        .agg(
            F.sum(F.when(F.col("__st") == "added", 1).otherwise(0))
            .cast("bigint").alias("n_added"),
            F.sum(F.when(F.col("__st") == "removed", 1).otherwise(0))
            .cast("bigint").alias("n_removed"),
            F.sum(F.when(F.col("__st") == "changed", 1).otherwise(0))
            .cast("bigint").alias("n_changed"),
            F.sum(F.when(F.col("__st") == "unchanged", 1).otherwise(0))
            .cast("bigint").alias("n_unchanged"),
        )
    )

"""Reshape operators: long<->wide pivot, one-hot encoding, melt.

The reference's signature reshapes (SURVEY.md §2.5): pandas ``pivot``
(etl_io.py:822-825) and the bool+pivot one-hot (etl_io.py:870-871).

Spark's ``groupBy().pivot(col, values).agg(...)`` is a single shuffle when
the pivot values are supplied explicitly; without them Spark runs an extra
distinct pass to discover categories — fine interactively, avoidable at
100 TB by passing ``values``. We surface both.

Semantic note (SURVEY.md §2.5): pandas ``pivot`` *raises* on duplicate
(index, column) pairs; Spark's ``agg(first)`` silently picks one.
``pivot_wide(strict=True)`` reproduces the pandas contract with a
count-vs-distinct guard executed as one cheap aggregate.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, functions as F


class DuplicatePivotKeyError(ValueError):
    """Pandas-pivot parity: duplicate (index, pivot) pairs found."""


def pivot_wide(
    df: DataFrame,
    index: str | Sequence[str],
    pivot_col: str,
    value_col: str,
    values: Sequence[str] | None = None,
    agg: Column | None = None,
    agg_fn: Callable[[Column], Column] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Long→wide pivot (R1/R2; etl_io.py:822-825).

    ``values``: known pivot categories — supply at scale to skip the
    discovery pass. ``agg`` defaults to ``first(value_col)`` (pandas
    semantics); pass e.g. ``F.sum(value_col)`` for additive reshape.
    ``strict=True`` raises if any (index, pivot) pair has >1 row.

    ``agg_fn`` (a Column→Column aggregate builder, e.g.
    ``lambda c: F.round(F.sum(c), 2)``) enables the *fused* plan: with
    explicit ``values`` the pivot becomes one conditional aggregation —
    ``agg_fn(when(pivot_col == v, value_col)).alias(v)`` per category —
    i.e. ONE groupBy/shuffle on the index keys. Spark's native
    ``groupBy().pivot().agg()`` plans a pre-aggregation on
    (index, pivot_col) plus a second pivot aggregation on index — two
    shuffles of the full fact table. At 100 TB the fused form halves
    shuffle volume; prefer it whenever the per-cell aggregate
    distributes over rows (sum/count/min/max — not first)."""
    keys = [index] if isinstance(index, str) else list(index)
    if strict:
        dup = (
            df.groupBy(*keys, pivot_col)
            .count()
            .where(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise DuplicatePivotKeyError(
                f"duplicate ({keys}, {pivot_col}) pairs; pandas pivot would raise"
            )
    if agg_fn is not None and values:
        cells = [
            agg_fn(
                F.when(F.col(pivot_col) == F.lit(v), F.col(value_col))
            ).alias(str(v))
            for v in values
        ]
        return df.groupBy(*keys).agg(*cells)
    gp = df.groupBy(*keys)
    piv = gp.pivot(pivot_col, list(values) if values else None)
    return piv.agg(agg if agg is not None else F.first(value_col))


def one_hot(
    df: DataFrame,
    index: str | Sequence[str],
    category_col: str,
    values: Sequence[str] | None = None,
) -> DataFrame:
    """One-hot encode (R3; etl_io.py:870-871: bool literal + pivot +
    fillna(False)) — columns become true/false presence flags.

    With explicit ``values`` this is a fused single-shuffle conditional
    aggregation (``coalesce(max(when(cat = v, true)), false)`` per flag)
    instead of the two-shuffle pivot plan; without them it falls back to
    pivot-with-discovery."""
    keys = [index] if isinstance(index, str) else list(index)
    if values:
        flags = [
            F.coalesce(
                F.max(F.when(F.col(category_col) == F.lit(v), F.lit(True))),
                F.lit(False),
            ).alias(str(v))
            for v in values
        ]
        return df.groupBy(*keys).agg(*flags)
    piv = (
        df.withColumn("__b", F.lit(True))
        .groupBy(*keys)
        .pivot(category_col, None)
        .agg(F.first("__b"))
    )
    flag_cols = [c for c in piv.columns if c not in keys]
    return piv.na.fill(False, subset=flag_cols)


def melt(
    df: DataFrame,
    ids: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide→long unpivot — inverse of R1, via Spark's native ``unpivot``
    (no UDF, no explode of structs)."""
    return df.unpivot(list(ids), list(value_cols), var_name, value_name)

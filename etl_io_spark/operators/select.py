"""Parameterized select / filter builder.

Spark-native re-expression of the reference's SQL-string assembly
(`IPEDSHandler.select` etl_io.py:156-201, `get_unitid` etl_io.py:245-269):
instead of formatting ``SELECT {cols} FROM {t} WHERE {preds}`` strings and
shipping them over ODBC, we compose Column predicates on a lazy DataFrame and
let Catalyst push them into the parquet scan (PushedFilters) — the same
pushdown the reference got by construction, but verified by ``.explain``.

Predicates accept scalars or lists exactly like the reference's
``fips=48, countycd=[48001, 48003]`` kwargs (etl_io.py:227-232): scalars
become equality, lists become IN-lists, all AND-ed together (P3/P4).
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _is_listlike(v: object) -> bool:
    return isinstance(v, Iterable) and not isinstance(v, (str, bytes))


def build_predicate(filters: Mapping[str, object]) -> Column | None:
    """AND of per-column predicates: scalar -> ``=``, list -> ``IN``.

    Reference: conjunctive IN-list WHERE assembly, etl_io.py:245-269 (P3)
    and ``MAJORNUM = n AND UNITID IN (...)`` etl_io.py:356-357 (P4).
    """
    pred: Column | None = None
    for col, val in filters.items():
        if val is None:
            continue
        clause = (
            F.col(col).isin(list(val)) if _is_listlike(val) else F.col(col) == F.lit(val)
        )
        pred = clause if pred is None else pred & clause
    return pred


def select(
    df: DataFrame,
    columns: Sequence[str] | str = "*",
    where: Column | str | None = None,
    filters: Mapping[str, object] | None = None,
) -> DataFrame:
    """Projected, filtered scan (S2/S3; etl_io.py:185-190).

    ``columns='*'`` keeps all; otherwise an explicit list (P1, etl_io.py:185).
    ``where`` takes a Column or SQL-text predicate; ``filters`` takes the
    scalar-or-list kwargs shape (P3/P4). Both compose with AND.
    """
    pred = build_predicate(filters) if filters else None
    if where is not None:
        w = F.expr(where) if isinstance(where, str) else where
        pred = w if pred is None else pred & w
    if pred is not None:
        df = df.where(pred)
    if columns != "*":
        df = df.select(*columns)
    return df


def where_isin(df: DataFrame, column: str, values: Sequence[object]) -> DataFrame:
    """Post-scan isin filter (P5; etl_io.py:383, 765-766)."""
    return df.where(F.col(column).isin(list(values)))


def where_length(df: DataFrame, column: str, length: int) -> DataFrame:
    """String-length predicate — the reference's CIP hierarchy-level
    selection ``[len(i)==7 for i in awd['CIPCODE']]`` (P7; etl_io.py:468-476),
    as a pushable Catalyst expression instead of a Python row loop."""
    return df.where(F.length(F.col(column)) == length)


def drop_nulls(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Null-drop (P8; etl_io.py:922)."""
    return df.na.drop(subset=list(subset) if subset else None)


def distinct_rows(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Distinct / drop_duplicates (P9; etl_io.py:76, 922).

    With ``subset``, keeps one arbitrary row per key like pandas
    ``drop_duplicates(subset=...)``; deterministic variants should prefer
    an explicit groupBy/min — see dedup.exact_dedup.
    """
    return df.dropDuplicates(list(subset)) if subset else df.distinct()


def drop_columns(df: DataFrame, *cols: str) -> DataFrame:
    """Drop column(s) (P10; etl_io.py:457)."""
    return df.drop(*cols)


def top_k(df: DataFrame, order_by: Sequence[Column | str], k: int) -> DataFrame:
    """Global top-k: ``ORDER BY ... LIMIT k``.

    Absent from the reference (SURVEY.md §2.7); Spark plans this as
    TakeOrderedAndProject — per-partition heaps, no full sort, no full
    shuffle — so it scales to 100 TB inputs with tiny k.
    """
    return df.orderBy(*order_by).limit(k)

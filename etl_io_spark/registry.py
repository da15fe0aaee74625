"""Graded-query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus its DuckDB oracle SQL.

``__spark_entry__.py`` (driver contract) re-exports this. Keeping the
registry in-package lets tests, bench.py and the driver all run the exact
same plans.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_io_spark.catalog import TableCatalog
from etl_io_spark.plans import pipelines

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (query_fn, oracle_sql | None)
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, sql: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame query with its oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        _REGISTRY[name] = (fn, sql)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {k: fn for k, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {k: sql for k, (_, sql) in _REGISTRY.items() if sql is not None}


def _cat(spark: SparkSession, sf_dir: str) -> TableCatalog:
    # views are per-session; re-registering is idempotent and cheap
    return TableCatalog(spark, sf_dir)


# --------------------------------------------------------------------------
# Flagship (Q2 "awards" shape)
# --------------------------------------------------------------------------
@register("pricing_summary", pipelines.PRICING_SUMMARY_SQL)
def _pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pipelines.pricing_summary(_cat(spark, sf_dir))

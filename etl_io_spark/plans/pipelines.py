"""Composite pipelines — the reference's end-user queries (SURVEY.md §2.8),
transposed onto the driver star schema (FIXTURES.md role mapping):

  fact ``lineitem``/``orders``  ≙  IPEDS awards fact ``C2019_A``
  dims ``customer``/``nation``/``region``  ≙  institution directory ``HD2019``
  ``l_returnflag × l_linestatus``  ≙  CIP code grouping keys

Each pipeline is pure DataFrame composition: filter → (broadcast) dim joins →
groupBy agg → decode/rename. Catalyst pushes the filters to the scan, prunes
columns, and picks broadcast-hash joins for the dims — verified via
``.explain("formatted")`` in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from etl_io_spark.catalog import TableCatalog


def pricing_summary(cat: TableCatalog, cutoff: str = "2000-12-01") -> DataFrame:
    """Flagship: the ``awards`` shape (Q2, etl_io.py:390-479) — predicate
    scan → groupBy composite key → multi-measure SUM/AVG/COUNT.

    Doubles are rounded so results are bit-identical to the DuckDB oracle
    (sum order across partitions is otherwise nondeterministic in the last
    ulp). Measure expressions run inside whole-stage codegen; the single
    shuffle carries only (returnflag × linestatus) partials.
    """
    li = cat.table("lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


PRICING_SUMMARY_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  ROUND(SUM(l_quantity), 2)                                           AS sum_qty,
  ROUND(SUM(l_extendedprice), 2)                                      AS sum_base_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                   AS sum_disc_price,
  ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)     AS sum_charge,
  ROUND(AVG(l_quantity), 6)                                           AS avg_qty,
  ROUND(AVG(l_extendedprice), 6)                                      AS avg_price,
  ROUND(AVG(l_discount), 6)                                           AS avg_disc,
  COUNT(*)                                                            AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

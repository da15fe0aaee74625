"""Tests for the size-gated partition-spread helper.

The contract matters at three scales:
  * tiny input  -> no-op (adding an exchange would cost more than it buys;
    measured 2-8x slower on the sf0.1 bench when spread unconditionally);
  * mid-size single-row-group input -> repartition to core count so the
    CPU-heavy downstream map parallelizes;
  * already-parallel input -> never reshuffled, never shrunk.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_io_spark.partitioning import plan_size_bytes, spread


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.01"


def test_spread_noop_on_tiny_input(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = spread(docs)
    assert out is docs  # identity, not just equal partitioning


def test_spread_engages_below_gate(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = spread(docs, min_bytes_per_partition=1)
    target = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == target
    # row-preserving: a pure round-robin exchange
    assert out.count() == docs.count()


def test_spread_never_shrinks(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = spark.sparkContext.defaultParallelism
    wide = docs.repartition(target * 2)
    assert spread(wide, min_bytes_per_partition=1) is wide


def test_plan_size_tracks_file_size(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    size = plan_size_bytes(docs)
    assert 0 < size < 1 << 40  # real stat, not the unknown sentinel


def test_spread_result_correct_when_forced(spark, sf_dir):
    """Aggregation results are invariant under the spread exchange."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = docs.groupBy((F.col("doc_id") % 7).alias("k")).count()
    spreaded = (
        spread(docs, min_bytes_per_partition=1)
        .groupBy((F.col("doc_id") % 7).alias("k"))
        .count()
    )
    assert sorted(base.collect()) == sorted(spreaded.collect())


def test_bucketed_join_plans_no_exchange(spark, sf_dir):
    """Two tables bucketed on the join key join WITHOUT any shuffle
    exchange (and without sorts, thanks to sortBy) — the write-once /
    join-many layout contract write_bucketed exists for."""
    from etl_io_spark.catalog import TableCatalog
    from etl_io_spark.sources.writers import write_bucketed

    cat = TableCatalog(spark, sf_dir)
    try:
        write_bucketed(
            cat.table("orders").select("o_custkey", "o_totalprice"),
            "t_orders_b",
            "o_custkey",
            n_buckets=4,
        )
        write_bucketed(
            cat.table("customer").select("c_custkey", "c_nationkey"),
            "t_cust_b",
            "c_custkey",
            n_buckets=4,
        )
        a = spark.table("t_orders_b")
        b = spark.table("t_cust_b")
        joined = a.join(b, a["o_custkey"] == b["c_custkey"]).groupBy(
            "c_nationkey"
        ).count()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not exchange; the only allowed exchange is
        # the final single-partition/groupBy on c_nationkey
        join_part = plan.split("SortMergeJoin")[-1] if "SortMergeJoin" in plan else plan
        assert "Exchange hashpartitioning(o_custkey" not in plan
        assert "Exchange hashpartitioning(c_custkey" not in plan
        n = joined.count()
        assert n > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """A table partitioned on the join key prunes its partitions at
    RUNTIME from the dim side's filter (DPP): the scan's PartitionFilters
    must carry a dynamicpruning subquery rather than reading all
    partitions."""
    from pyspark.sql import Row, functions as F

    from etl_io_spark.catalog import TableCatalog

    path = str(tmp_path / "orders_by_prio")
    TableCatalog(spark, sf_dir).table("orders").write.mode(
        "overwrite"
    ).partitionBy("o_orderpriority").parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [Row(prio="1-URGENT", label="u"), Row(prio="2-HIGH", label="h")]
    ).where(F.col("label") == "u")
    joined = fact.join(dim, fact["o_orderpriority"] == dim["prio"]).agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    n = joined.collect()[0]["n"]
    # matches only the 1-URGENT partition's rows
    urgent = fact.where(F.col("o_orderpriority") == "1-URGENT").count()
    assert n == urgent > 0


def test_broadcast_budget_bytes_parsing(spark):
    """Suffixed conf forms, plain ints, and the disabled sentinel all
    parse; unparsable values gate conservatively to 0 (ADVICE r7 — the
    lm model-broadcast decision rides this)."""
    from etl_io_spark.partitioning import broadcast_budget_bytes

    df = spark.range(1)
    key = "spark.sql.autoBroadcastJoinThreshold"
    orig = spark.conf.get(key)
    try:
        for raw, want in [
            ("10485760", 10485760),
            ("10MB", 10 * 1024**2),
            ("64m", 64 * 1024**2),
            ("1g", 1024**3),
            ("-1", 0),
        ]:
            spark.conf.set(key, raw)
            assert broadcast_budget_bytes(df) == want, raw
    finally:
        spark.conf.set(key, orig)

    # vanilla Spark's conf validator rejects non-numeric values, but some
    # distributions accept "auto" — the helper must still gate to 0
    class _Conf:
        def get(self, k, d=None):
            return "auto"

    class _Sess:
        conf = _Conf()

    class _Df:
        sparkSession = _Sess()

    assert broadcast_budget_bytes(_Df()) == 0


def test_lm_broadcast_gate_scale_safe(spark):
    """lm_cross_entropy's default model-broadcast is SIZE-GATED (ADVICE
    r7): identical scores whether the model table is broadcast or
    shuffle-joined, and a corpus whose scan estimate exceeds the budget
    must take the scale-safe shuffle path by default."""
    from etl_io_spark.operators import text as txt

    df = spark.createDataFrame(
        [(i, f"tok{i % 7} tok{(i + 1) % 7} tok{i % 5} common words")
         for i in range(60)],
        "doc_id int, text string",
    )
    on = sorted(map(tuple, txt.lm_cross_entropy(
        df, "doc_id", "text", broadcast_model=True).collect()))
    off = sorted(map(tuple, txt.lm_cross_entropy(
        df, "doc_id", "text", broadcast_model=False).collect()))
    assert on == off and len(on) == 60

    key = "spark.sql.autoBroadcastJoinThreshold"
    orig = spark.conf.get(key)
    try:
        spark.conf.set(key, "-1")  # broadcast disabled -> budget 0
        plan = (
            txt.lm_cross_entropy(df, "doc_id", "text")
            ._jdf.queryExecution().optimizedPlan().toString()
        )
        # the explicit model-side broadcast hint must NOT appear
        assert "ResolvedHint" not in plan, plan[:2000]
    finally:
        spark.conf.set(key, orig)

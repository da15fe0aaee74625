"""Phase 0: session, catalog, flagship query, driver contract."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from etl_io_spark.catalog import STAR_TABLES, TableCatalog
from etl_io_spark.plans.pipelines import pricing_summary


def test_catalog_lists_all_tables(cat):
    assert set(STAR_TABLES) <= set(cat.tables())


def test_catalog_columns(cat):
    assert "l_orderkey" in cat.columns("lineitem")
    assert cat.columns("region") == ["r_regionkey", "r_name"]


def test_catalog_unknown_table(cat):
    with pytest.raises(KeyError):
        cat.table("nope")


def test_nanos_timestamp_surface_as_timestamp(cat):
    dt = dict(cat.table("events").dtypes)
    assert dt["ts"] == "timestamp"


def test_sql_passthrough(cat):
    n = cat.sql("SELECT count(*) AS n FROM region").collect()[0]["n"]
    assert n == 5


def test_pricing_summary_shape(cat):
    rows = pricing_summary(cat).collect()
    assert 1 <= len(rows) <= 6  # at most |returnflag| x |linestatus|
    r = rows[0]
    assert r["count_order"] > 0
    assert r["sum_disc_price"] <= r["sum_base_price"]


def test_pricing_summary_plan_pushes_filter(cat):
    plan = pricing_summary(cat)._jdf.queryExecution().executedPlan().toString()
    # the shipdate predicate must reach the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_driver_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, oracles = e.queries(), e.oracle_sql()
    assert "pricing_summary" in qs
    assert set(oracles) <= set(qs)


def test_rows_only_keys_have_live_accuracy_tests():
    """The registry's rows-only gate names one accuracy test per
    oracle-less key; verify each named test function still exists so the
    map can't point at deleted tests (VERDICT r5 ask #9)."""
    import os

    from etl_io_spark.registry import ROWS_ONLY_ACCURACY_TESTS

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for key, ref in ROWS_ONLY_ACCURACY_TESTS.items():
        path, name = ref.split("::")
        full = os.path.join(root, path)
        assert os.path.exists(full), f"{key}: {path} missing"
        with open(full) as fh:
            assert f"def {name}(" in fh.read(), f"{key}: {ref} gone"

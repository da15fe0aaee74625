"""Measure the DuckDB-oracle vs PySpark wall time per graded query and emit
the BASELINE.md markdown table (protocol: warm run = 2nd of 3, sf0.1,
both engines on the same parquet files, Spark forced via noop sink,
DuckDB forced via fetchall)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from etl_io_spark.catalog import STAR_TABLES
from etl_io_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _warm(fn, runs: int = 3) -> float:
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main() -> None:
    import __spark_entry__ as entrymod

    spark = get_spark(
        "baseline", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in STAR_TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    print("| query key | duckdb oracle (s) | pyspark (s) | ratio | notes |")
    print("|---|---|---|---|---|")
    total_d = total_s = 0.0
    for name, fn in qs.items():
        df = fn(spark, SF_DIR)
        ts = _warm(lambda: df.write.format("noop").mode("overwrite").save())
        if name in oracles:
            td = _warm(lambda: con.sql(oracles[name]).fetchall())
            note = ""
        else:
            td, note = float("nan"), "no SQL oracle (approx/python op)"
        total_s += ts
        total_d += 0 if td != td else td
        ratio = "—" if td != td else f"{ts / td:.1f}x"
        td_s = "—" if td != td else f"{td:.2f}"
        print(f"| {name} | {td_s} | {ts:.2f} | {ratio} | {note} |")
    print(f"| **total (oracled)** | **{total_d:.2f}** | **{total_s:.2f}** | | |")


if __name__ == "__main__":
    main()

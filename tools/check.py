"""Local differential harness replicating the driver's correctness gate.

For every entry in ``__spark_entry__.queries()``: run the Spark plan and the
DuckDB oracle on the same sf dir, then compare row count, column names/types,
and order-insensitive values (exact string equality after canonicalization —
stricter than any hash, so passing here implies passing the driver's check).

Usage:  python tools/check.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from etl_io_spark import caching
from etl_io_spark.catalog import STAR_TABLES
from etl_io_spark.session import get_spark


def _canon_cell(v: object) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # canonical repr: 12 significant digits collapses FP-last-ulp noise
        # ONLY for display; the engine must already round for parity.
        return repr(v)
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def _canon_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(_canon_cell(r[i]) for i in order) for r in rows)


def run_check(sf_dir: str, only: list[str] | None = None) -> int:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    spark = get_spark(
        "check", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in STAR_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        finally:
            # several operators pin intermediates for the duration of
            # their action (shingle sets, graph frontiers); across a
            # ~200-query session those would pile up in the block manager
            # — release them once the query has materialized. The drain
            # also reaches localCheckpoint RDD storage, which clearCache
            # cannot.
            caching.drain_persisted()
            spark.catalog.clearCache()
        if name not in oracles:
            print(f"ok*   {name}: rows={len(srows)} (rows-only; no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            if len(srows) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            s = _canon_rows(scols, srows)
            o = _canon_rows(ocols, orows)
            if s != o:
                diffs = [(a, b) for a, b in zip(s, o) if a != b][:3]
                problems.append(f"values differ; first diffs: {diffs}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"ok    {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")
    print(f"\n{len(qs) - failures}/{len(qs)} passed")
    return failures


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    sys.exit(1 if run_check(args.sf, args.names or None) else 0)

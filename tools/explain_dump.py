"""Dump ``.explain("formatted")`` for graded queries to plans/r12/.

Usage:
  python tools/explain_dump.py --suffix before name1 name2 ...
  python tools/explain_dump.py --suffix after  name1 name2 ...

Writes ``plans/r12/<name>_<suffix>.txt`` with the FORMATTED physical
plan of the registry query at $SPARK_GRAFT_SF_DIR (default sf0.1).
The plan is captured pre-execution (``AdaptiveSparkPlan
isFinalPlan=false``) — the judge checks plan-shape claims (Exchange
count, join strategy, PushedFilters, generator nodes) against these
files; runtime AQE conversions are documented in PLANS.md instead.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_io_spark import caching
from etl_io_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--outdir", default=None)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod

    outdir = args.outdir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark("explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in args.names:
        df = qs[name](spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"== {name} @ {SF_DIR} ==\n\n")
            fh.write(buf.getvalue())
        caching.drain_persisted()
        spark.catalog.clearCache()
        print(f"wrote {path}")


if __name__ == "__main__":
    main()

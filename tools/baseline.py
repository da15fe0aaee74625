"""Measure the DuckDB-oracle vs PySpark wall time per graded query and emit
the BASELINE.md markdown table (protocol: warm run = median of 3, sf0.1,
both engines on the same parquet files, Spark forced via noop sink,
DuckDB forced via fetchall).

Robustness: a run slower than ``SLOW_CUTOFF_S`` is not repeated (its first
time stands — repetition is for JIT/cache warmup noise, which a 20 s+ run
amortizes on its own), and every oracle runs under a watchdog that calls
``con.interrupt()`` at ``BASELINE_ORACLE_TIMEOUT`` seconds (default 300) —
some single-node oracles (recursive-CTE transitive closure at sf0.1) are
asymptotically slower than the distributed plan and would otherwise run for
hours; an aborted oracle is recorded as ``> {timeout}`` with the Spark time
still measured."""

from __future__ import annotations

import os
import sys
import statistics
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from etl_io_spark import caching
from etl_io_spark.catalog import STAR_TABLES
from etl_io_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SLOW_CUTOFF_S = 20.0
ORACLE_TIMEOUT_S = float(os.environ.get("BASELINE_ORACLE_TIMEOUT", "300"))


def _warm(fn, runs: int = 3, reset=None) -> float:
    """Median of up to ``runs`` executions; stop early once a single run
    exceeds SLOW_CUTOFF_S (long runs self-amortize warmup noise).

    ``fn`` must build a FRESH plan per call: re-executing one DataFrame
    object reuses its shuffle-stage outputs and skips whole stages —
    the round-2 baseline understated several Spark times this way (and
    mis-ranked a repartition as a regression). DuckDB re-runs the full
    SQL each time, so fresh-plan timing is the like-for-like protocol.

    ``reset`` runs between repeats (untimed). Spark callers pass
    ``spark.catalog.clearCache`` — each fresh plan re-``persist()``s its
    own intermediates, so WITHOUT the reset a persisting query's repeat
    runs accumulate duplicate cache blocks and the median reads the
    memory-pressure artifact, not the query (measured: LPA 7 s → 20 s by
    run three).
    """
    times = []
    for i in range(runs):
        if i and reset is not None:
            reset()
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
        if times[-1] > SLOW_CUTOFF_S:
            break
    # statistics.median: the early-stop can leave an even-length sample,
    # where sorted()[n//2] reported the SLOWER of two runs (ADVICE r5)
    return statistics.median(times)


def _warm_oracle(con, sql: str) -> tuple[float, bool]:
    """(median seconds, timed_out). The watchdog interrupts DuckDB at
    ORACLE_TIMEOUT_S; the run count follows the same early-stop rule."""
    times = []
    for _ in range(3):
        watchdog = threading.Timer(ORACLE_TIMEOUT_S, con.interrupt)
        watchdog.start()
        t0 = time.perf_counter()
        try:
            con.sql(sql).fetchall()
        except duckdb.Error:
            return time.perf_counter() - t0, True
        finally:
            watchdog.cancel()
        times.append(time.perf_counter() - t0)
        if times[-1] > SLOW_CUTOFF_S:
            break
    return statistics.median(times), False


def _reset_storage(spark):
    """Between-repeat reset: drain tracked persists AND localCheckpoint RDD
    storage (clearCache alone misses the latter — see etl_io_spark.caching),
    then clear the relation cache."""

    def run():
        caching.drain_persisted()
        spark.catalog.clearCache()

    return run


def main() -> None:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # optional key subset (same CLI shape as tools/check.py) — lets a new
    # query's measured row be appended without re-running the full table
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if names:
        unknown = [n for n in names if n not in qs]
        if unknown:
            raise SystemExit(f"unknown keys: {unknown}")
        qs = {k: qs[k] for k in names}

    # ---- pass 1: DuckDB ALONE, before any JVM exists. A resident (even
    # idle) 32-thread Spark JVM was measured to inflate sub-second DuckDB
    # runs ~7x (0.05 s -> 0.36 s on the window_topk oracle) — GC/daemon
    # threads and page-cache pressure poison interleaved timing. All
    # oracles run first; the JVM starts only after this pass.
    con = duckdb.connect()
    for t in STAR_TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.isdir(p):
            # Spark-written tables are DIRECTORIES of part files (the 10x
            # probe corpus); DuckDB needs the glob form there.
            con.execute(
                f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}/*.parquet'"
            )
        elif os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")
    oracle_times: dict[str, tuple[float, bool]] = {}
    for name in qs:
        if name in oracles:
            oracle_times[name] = _warm_oracle(con, oracles[name])
            print(
                f"oracle {name}: {oracle_times[name][0]:.2f}s",
                file=sys.stderr,
                flush=True,
            )
    con.close()

    # ---- pass 2: Spark. Same JVM warmup as bench.py so the first timed
    # query doesn't pay one-time class loading.
    spark = get_spark(
        "baseline", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    (
        spark.range(1000)
        .groupBy(F.pmod("id", F.lit(7)))
        .agg(F.sum("id"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    print("| query key | duckdb oracle (s) | pyspark (s) | ratio | notes |")
    print("|---|---|---|---|---|", flush=True)
    total_d = total_s = 0.0
    for name, fn in qs.items():
        ts = _warm(
            lambda: fn(spark, SF_DIR)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            reset=_reset_storage(spark),
        )
        _reset_storage(spark)()
        if name in oracle_times:
            td, timed_out = oracle_times[name]
            note = (
                f"oracle aborted at {ORACLE_TIMEOUT_S:.0f} s "
                "(single-node plan asymptotically slower); Spark measured"
                if timed_out
                else ""
            )
        else:
            td, timed_out = float("nan"), False
            note = "no SQL oracle (approx/python op)"
        oracled = td == td and not timed_out
        if oracled:
            total_s += ts
            total_d += td
        ratio = f"{ts / td:.1f}x" if oracled else "—"
        td_s = (
            f"> {td:.0f}" if timed_out else "—" if td != td else f"{td:.2f}"
        )
        print(f"| {name} | {td_s} | {ts:.2f} | {ratio} | {note} |", flush=True)
    print(f"| **total (oracled)** | **{total_d:.2f}** | **{total_s:.2f}** | | |")


if __name__ == "__main__":
    main()

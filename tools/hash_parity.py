"""Driver-hash parity harness: reproduce plausible value-hash semantics
and inventory the FRAGILITY CLASSES that can make a driver-side hash
diverge even when tools/check.py's exact string comparison passes.

Round-4 background: `substring_dedup_docs` and `hits_trade_graph` failed
the driver's `hash_match` while passing exact-equality locally under
three protocols — the compared columns were DOUBLEs built from integer
ratios, and the oracle leaked DuckDB HUGEINT into the result. We cannot
see the driver's hash function, so instead of one comparison this tool
re-compares every (query, oracle) result pair under SEVERAL
canonicalization regimes; a key is ROBUST only if every regime agrees.
Any regime disagreement, or membership in a structural fragility class,
is reported so the key can be hardened (integer ppm columns, explicit
BIGINT casts) before the driver grades it.

Regimes (value -> token):
  repr       Python repr (tools/check.py semantics)
  g17        '%.17g' formatting (round-trip doubles, collapses 1.0/1)
  g12        '%.12g' (a lossier hash a driver might plausibly use)
  numeq      ints and integral floats unified (2 == 2.0), -0.0 -> 0.0

Structural fragility classes per key (reported, not failing by default):
  FLOAT_COLS   compared output contains float/double columns
  TYPE_DRIFT   Python types differ between Spark and DuckDB cells in the
               same column (e.g. int vs float vs Decimal — the HUGEINT
               class surfaces here via duckdb -> int but DECIMAL -> Decimal)
  NEG_ZERO     a -0.0 appears on either side
  NAN          a NaN appears on either side
  TIE_EDGE     a float lies within 1e-9 of a .5 ulp at 6 decimals (the
               FLOOR(x*1e6+0.5) boundary — engine last-ulp noise flips it)

Usage:  python tools/hash_parity.py [--sf DIR] [--strict] [names...]
  --strict  exit nonzero when any key has a regime disagreement OR is in
            FLOAT_COLS+TIE_EDGE (the class that bit round 4).

END-OF-ROUND GATE (round-6 policy, VERDICT r5 ask #6): before a round
ships, run this tool over (a) every oracle ADDED or CHANGED during the
round and (b) every key entering the driver's 50-slot grading window for
the first time (``registry._WINDOW_ORDER``), at sf0.01 AND — for
float-heavy families — sf0.1 (some divergences only materialize at
larger row counts). A key may not enter the window while flagged. The
per-round sweep log is committed as ``HASHPARITY_r{N}.log`` at the repo
root so the grading trail is auditable.
"""

from __future__ import annotations

import argparse
import math
import os
import sys
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from etl_io_spark import caching
from etl_io_spark.catalog import STAR_TABLES
from etl_io_spark.session import get_spark


def _tok_repr(v: object) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_tok_repr(x) for x in v) + "]"
    return repr(v) if isinstance(v, float) else str(v)


def _tok_g(v: object, digits: int) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"%.{digits}g" % v
    if isinstance(v, Decimal):
        return f"%.{digits}g" % float(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_tok_g(x, digits) for x in v) + "]"
    return str(v)


def _tok_numeq(v: object) -> str:
    if v is None:
        return "∅"
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0"  # folds -0.0 and 0.0 and integral zero
        if v.is_integer() and abs(v) < 2**53:
            return str(int(v))
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_tok_numeq(x) for x in v) + "]"
    return str(v)


REGIMES = {
    "repr": _tok_repr,
    "g17": lambda v: _tok_g(v, 17),
    "g12": lambda v: _tok_g(v, 12),
    "numeq": _tok_numeq,
}


def _canon(columns, rows, tok):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("|".join(tok(r[i]) for i in order) for r in rows)


def _flatten(v):
    if isinstance(v, (list, tuple)):
        for x in v:
            yield from _flatten(x)
    else:
        yield v


def _classes(scols, srows, ocols, orows) -> set[str]:
    out: set[str] = set()
    float_cols = False
    for rows, side in ((srows, "s"), (orows, "o")):
        for r in rows[:20000]:
            for v in _flatten(r):
                if isinstance(v, float):
                    float_cols = True
                    if math.isnan(v):
                        out.add("NAN")
                    elif v == 0.0 and math.copysign(1.0, v) < 0:
                        out.add("NEG_ZERO")
                    else:
                        frac = abs(v) * 1e6 % 1.0
                        if 0.5 - 1e-9 < frac < 0.5 + 1e-9:
                            out.add("TIE_EDGE")
                elif isinstance(v, Decimal):
                    out.add("DECIMAL")
    if float_cols:
        out.add("FLOAT_COLS")
    # TYPE_DRIFT: per column, compare the first non-null Python type.
    # Align both sides by matching column NAME (dict lookup) — not by
    # zipping the two sorted name lists: when the sides disagree on
    # column count or names, a positional zip silently truncates or
    # mispairs and under-reports drift for exactly the malformed-oracle
    # cases this tool exists to catch (ADVICE r6). A name present on
    # only one side is its own fragility class.
    if srows and orows:
        smap = {c: i for i, c in enumerate(scols)}
        omap = {c: i for i, c in enumerate(ocols)}
        if set(smap) != set(omap):
            out.add("COL_NAME_MISMATCH")
        for name in sorted(set(smap) & set(omap)):
            si, oi = smap[name], omap[name]
            st = next(
                (type(r[si]) for r in srows if r[si] is not None), None
            )
            ot = next(
                (type(r[oi]) for r in orows if r[oi] is not None), None
            )
            if st and ot and st is not ot and not (
                st in (list, tuple) and ot in (list, tuple)
            ):
                out.add("TYPE_DRIFT")
    return out


def main(sf_dir: str, only, strict: bool) -> int:
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}

    spark = get_spark(
        "hash_parity", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in STAR_TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    bad = 0
    flagged: list[str] = []
    for name, fn in sorted(qs.items()):
        if name not in oracles:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: spark: {e}")
            bad += 1
            continue
        finally:
            caching.drain_persisted()
            spark.catalog.clearCache()
        try:
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"ERR   {name}: duckdb: {e}")
            bad += 1
            continue
        if sorted(scols) != sorted(ocols) or len(srows) != len(orows):
            print(f"ERR   {name}: shape mismatch (run tools/check.py)")
            bad += 1
            continue
        mismatch = [
            rg
            for rg, tok in REGIMES.items()
            if _canon(scols, srows, tok) != _canon(ocols, orows, tok)
        ]
        cls = _classes(scols, srows, ocols, orows)
        risky = bool(mismatch) or (
            "FLOAT_COLS" in cls and "TIE_EDGE" in cls
        )
        tag = (
            "FRAGILE" if mismatch else ("RISKY " if risky else "robust")
        )
        note = ""
        if mismatch:
            note = f" regime-mismatch={mismatch}"
        if cls:
            note += f" classes={sorted(cls)}"
        if mismatch or risky or cls - {"FLOAT_COLS"}:
            print(f"{tag} {name}:{note}")
        if risky:
            flagged.append(name)
            if strict:
                bad += 1
    print(
        f"\n{len(flagged)} flagged key(s): {flagged}" if flagged else "\nall keys robust"
    )
    return bad


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--strict", action="store_true")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    sys.exit(1 if main(args.sf, args.names or None, args.strict) else 0)

"""Adversarial-corpus differential harness: the round-10 sweep that caught
19 latent cross-engine divergences, pinned as a repeatable tool.

Builds ``--out`` (default /tmp/sfadv) as the ``--sf`` base corpus (default
sf0.001) with ADVERSARIAL document rows appended — empty text,
whitespace-only text, NULL text, a single-token doc, and padded-edges
text — then runs tools/check.py's exact-equality compare over every
registry key on it. The base tables other than documents are symlinked.

What this corpus flushes out (all live catches in round 10):
  * oracle token counts using the UNFILTERED split form
    (``len(string_split_regex(trim(text), '\\s+'))`` = 1 for empty text
    where Spark's ``regexp_count('\\S+')`` = 0);
  * Spark ``size(NULL)`` = -1 leaking as a "count" where oracles
    null-propagate (non-ANSI mode);
  * NULL-text rows crashing binary decode paths or silently occupying
    packing/chunking slots;
  * asymmetric NULL handling in CASE batteries (one engine awarding a
    score term to NULL text);
  * rounding-boundary flips that only materialize at this corpus's row
    counts (terminating interpolants under ROUND's HALF_UP-vs-binary
    split — percentiles, histogram bin edges).

Usage:  python tools/adversarial_check.py [--sf DIR] [--out DIR] [names...]
Exit nonzero on any mismatch. Run it whenever an oracle or a text-battery
expression changes; keep it green alongside the sf0.01/sf0.1 sweeps.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "embeddings",
)

#: (doc_id, text, lang, source, n_chars) — ids far above any real doc_id
ADVERSARIAL_DOCS = [
    (9001, "''", "en", "src0", 0),                      # empty
    (9002, "'   '", "en", "src1", 3),                   # whitespace-only
    (9003, "CAST(NULL AS VARCHAR)", "de", "src2", "NULL"),  # NULL text,
    #   NULL n_chars too — keeps the n_chars == LENGTH(text) invariant so
    #   n_chars CONSUMERS are also probed for NULL propagation
    (9006, "'a' || chr(11) || 'b'", "en", "src1", 3),    # \x0B: RE2 \s
    #   excludes vertical tab, Java \s includes it — one token on BOTH
    #   engines only because the engine standardizes on the RE2 class
    (9004, "'solo'", "fr", "src3", 4),                  # single token
    (9005, "'  padded  both  ends  '", "en", "src0", 22),
]


def build(src: str, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    rows = ",\n    ".join(
        f"({i}, {t}, '{lang}', '{srcc}', {nc})"
        for i, t, lang, srcc, nc in ADVERSARIAL_DOCS
    )
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{src}/documents.parquet'
          UNION ALL
          SELECT * FROM (VALUES
            {rows}
          ) AS t(doc_id, text, lang, source, n_chars)
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    for t in TABLES:
        dst = os.path.join(out, f"{t}.parquet")
        # always refresh: a pre-existing (possibly dangling, possibly
        # pointing at a DIFFERENT --sf) link would silently mix corpora —
        # a false green for the row-count-dependent divergence classes
        if os.path.islink(dst) or os.path.exists(dst):
            os.remove(dst)
        os.symlink(os.path.join(src, f"{t}.parquet"), dst)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="/tmp/sfadv")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()
    # symlink targets are resolved relative to the LINK's directory, not
    # the CWD — a relative --sf would build dangling links under --out
    # and surface as a confusing downstream check.py failure (ADVICE r10)
    args.sf = os.path.abspath(args.sf)
    args.out = os.path.abspath(args.out)
    build(args.sf, args.out)
    here = os.path.dirname(os.path.abspath(__file__))
    cmd = [sys.executable, os.path.join(here, "check.py"), "--sf", args.out]
    cmd += args.names
    raise SystemExit(subprocess.call(cmd))


if __name__ == "__main__":
    main()

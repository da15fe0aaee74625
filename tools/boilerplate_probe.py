"""Stop-shingle probe: the corpus profile where prefix filtering is the
only viable exact-Jaccard plan.

The driver's synthetic documents share no ubiquitous shingles, so the
all-pairs inverted index (sum of df^2 join rows per shingle) stays
tractable and its simpler plan beats the prefix plan's extra stages.
Real web/text corpora are the opposite: boilerplate (licenses, nav
text, signatures) appears in ~every document, and each boilerplate
shingle alone contributes |corpus|^2 join rows to the all-pairs plan.
This probe appends one shared boilerplate sentence to every sf0.1
document and times both plans at threshold 0.6 — high enough that the
boilerplate overlap alone (J ~ 0.25) creates NO true pairs, so the cost
difference is pure candidate machinery: all-pairs must join every
boilerplate shingle (~33 shingles x df=|corpus| -> sum df^2 ~ 4*10^8
join rows at sf0.1) while the rarity-ordered prefix plan leaves
boilerplate shingles at the tail of every ordering, never joining them.

Usage: python tools/boilerplate_probe.py [--timeout-sec 120]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_io_spark.operators import dedup
from etl_io_spark.session import get_spark

BOILERPLATE = (
    " this document is provided as is without warranty of any kind either"
    " express or implied including but not limited to the implied"
    " warranties of merchantability and fitness for a particular purpose"
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--timeout-sec", type=float, default=120.0)
    args = ap.parse_args()

    spark = get_spark("boilerplate_probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(f"{args.sf}/documents.parquet")
        .withColumn("text", F.concat(F.col("text"), F.lit(BOILERPLATE)))
    )
    docs.count()

    for name, fn in (
        ("prefix", dedup.jaccard_pairs_prefix),
        ("all_pairs", dedup.ngram_jaccard_pairs),
    ):
        t0 = time.perf_counter()
        try:
            n = fn(docs, "doc_id", "text", threshold=0.6).count()
            dt = time.perf_counter() - t0
            print(f"{name}: {dt:.1f}s, {n} pairs", flush=True)
        except Exception as ex:  # pragma: no cover
            print(f"{name}: FAILED {type(ex).__name__}", flush=True)
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()

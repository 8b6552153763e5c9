"""Same-session warm band for `plaid_index_build` / `index_docs_per_sec`.

VERDICT r12 watch item 1: `index_docs_per_sec` is the only headline axis
that moved the wrong way in r12 (328 -> 237 -> 156 across three rounds)
and the only one WITHOUT a same-session warm band. The PLAID build path
was untouched in r12, so the hypothesis is cold-start + host drift — the
same story warm-banding settled for the three r11 movers. Discipline
identical to tools/warm_band_r12.py: reproduce the bench's setup ONCE
(same session warm-up), then run the timed section N times back-to-back
in one process. Cold-start + drift lands in run 1; a real plan/build
regression shows up in every run.

Each run builds into a FRESH temp dir (the bench's `_plaid_index` is
memoized per sf_dir; the thing being banded is the build itself, so the
cache is bypassed) with the same geometry the bench times: nbits=4,
seed=42, bucketed tokens (SPARK_GRAFT_BUCKET_TOKENS, default 32).

Usage: python tools/warm_band_r13.py [sf_dir] [runs]
Prints one JSON line: walls, docs/s per run, and the warm band.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from next_plaid_spark import queries as q
    from next_plaid_spark.plans.builder import IndexBuilder
    from next_plaid_spark.session import get_spark

    spark = get_spark("warm_band_r13")
    spark.sparkContext.setLogLevel("ERROR")

    # the bench's warm-up, verbatim geometry (bench.py:134-144)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    warm.groupBy("source").count().collect()

    buckets = int(os.environ.get("SPARK_GRAFT_BUCKET_TOKENS", "32")) or None
    tokens = q._doc_tokens(spark, sf_dir)

    walls, rates = [], []
    num_docs = None
    for i in range(runs):
        root = tempfile.mkdtemp(prefix=f"plaid_band_r13_{i}_")
        path = os.path.join(root, "index")
        t0 = time.time()
        idx = IndexBuilder(spark, nbits=4, seed=42,
                           bucket_tokens=buckets).build(tokens, path)
        wall = round(time.time() - t0, 3)
        num_docs = idx.meta.num_documents
        walls.append(wall)
        rates.append(round(num_docs / wall, 1))
        shutil.rmtree(root, ignore_errors=True)

    print(json.dumps({
        "probe": "plaid_index_build", "sf_dir": sf_dir, "runs": runs,
        "num_documents": num_docs, "walls": walls, "docs_per_sec": rates,
        "warm_band_docs_per_sec": [min(rates[1:]), max(rates[1:])],
    }), flush=True)


if __name__ == "__main__":
    main()

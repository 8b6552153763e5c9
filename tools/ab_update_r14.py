"""Warm repeated timing of CodeIndex.update (2-file delta) — the A/B
instrument for the r14 update-path changes. Runs N updates in one session
and prints each wall + the session job count per update.

Usage: python tools/ab_update_r14.py [sf_dir] [n_reps]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from next_plaid_spark import queries as q
    from next_plaid_spark.session import get_spark

    spark = get_spark("ab-update-r14")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    ci = q._code_index(spark, sf_dir)
    files = q._code_corpus(spark, sf_dir)
    touched = [r.path for r in files.select("path").orderBy("path").limit(2).collect()]
    new_files = files.withColumn(
        "content",
        F.when(F.col("path").isin(touched),
               F.concat(F.col("content"),
                        F.lit("\ndef bench_touch():\n    return benchtouched\n"))
        ).otherwise(F.col("content")))

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    walls = []
    for i in range(reps):
        upd_path = os.path.join(tempfile.mkdtemp(prefix=f"ab_upd_{i}_"), "index")
        j0 = len(tracker.getJobIdsForGroup(None) or [])
        t0 = time.time()
        ci.update(new_files, upd_path)
        w = time.time() - t0
        j1 = len(tracker.getJobIdsForGroup(None) or [])
        walls.append(w)
        print(f"rep {i}: wall {w:.2f}s jobs {j1 - j0}")
    print(f"walls: {[round(w, 2) for w in walls]}  min {min(walls):.2f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

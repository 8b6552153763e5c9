"""Same-session band for `code_index_update_speedup` (r13).

The bench's ratio (cold code-index build wall / 2-file incremental
update wall) read 1.6 → 1.7 → 1.3 across r11-r13 with no band. As a
same-session ratio it should be drift-immune, so a real move would mean
the update leg got relatively slower. Band it the house way: ONE build
(its cold wall is the bench's numerator by construction), then N
back-to-back 2-file updates into fresh dirs — the bench's exact edit
recipe — reporting each update wall and the ratio spread. Also reports
the ratio against the WARM build wall (a second build), since the cold
numerator inflates the speedup by whatever JIT/session cost lands in
build run 1.

Usage: python tools/warm_band_r13b.py [sf_dir] [runs]
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
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from next_plaid_spark import queries as q
    from next_plaid_spark.operators.code_index import CodeIndex
    from next_plaid_spark.session import get_spark

    spark = get_spark("warm_band_r13b")
    spark.sparkContext.setLogLevel("ERROR")

    files = q._code_corpus(spark, sf_dir).cache()
    files.count()

    def build(tag):
        root = tempfile.mkdtemp(prefix=f"ci_band_{tag}_")
        path = os.path.join(root, "index")
        t0 = time.time()
        idx = CodeIndex.build(files, path, bucket_tokens=32)
        return idx, round(time.time() - t0, 2), root

    ci, cold_build, root0 = build("cold")

    touched = [r.path for r in files.select("path")
               .orderBy("path").limit(2).collect()]
    new_files = files.withColumn(
        "content",
        F.when(F.col("path").isin(touched),
               F.concat(F.col("content"),
                        F.lit("\ndef bench_touch():\n"
                              "    return benchtouched\n")),
               ).otherwise(F.col("content")))

    upd_walls = []
    for i in range(runs):
        upd_root = tempfile.mkdtemp(prefix=f"ci_band_upd{i}_")
        t0 = time.time()
        ci.update(new_files, os.path.join(upd_root, "index"))
        upd_walls.append(round(time.time() - t0, 2))
        shutil.rmtree(upd_root, ignore_errors=True)

    _, warm_build, root1 = build("warm")
    shutil.rmtree(root0, ignore_errors=True)
    shutil.rmtree(root1, ignore_errors=True)

    print(json.dumps({
        "probe": "code_index_update_speedup",
        "sf_dir": sf_dir,
        "cold_build_s": cold_build,
        "warm_build_s": warm_build,
        "update_walls_s": upd_walls,
        "speedup_vs_cold": [round(cold_build / w, 2) for w in upd_walls],
        "speedup_vs_warm": [round(warm_build / w, 2) for w in upd_walls],
    }), flush=True)


if __name__ == "__main__":
    main()

"""Same-session warm A/B of CodeIndex.update (2 touched files) — r15.

Usage: python tools/ab_code_update_r15.py [n]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from next_plaid_spark import queries as q
    from next_plaid_spark.session import get_spark

    spark = get_spark("ab-code-update-r15")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    ci = q._code_index(spark, sf_dir)
    files = q._code_corpus(spark, sf_dir)
    touched = [r.path for r in files.select("path")
               .orderBy("path").limit(2).collect()]
    new_files = files.withColumn(
        "content",
        F.when(F.col("path").isin(touched),
               F.concat(F.col("content"),
                        F.lit("\ndef bench_touch():\n"
                              "    return benchtouched\n"))
               ).otherwise(F.col("content")))
    walls = []
    for i in range(n):
        out = os.path.join(tempfile.mkdtemp(prefix="ab_ci_upd_"), "index")
        t0 = time.time()
        ci.update(new_files, out)
        walls.append(round(time.time() - t0, 2))
    print("update walls:", walls)
    return 0


if __name__ == "__main__":
    sys.exit(main())

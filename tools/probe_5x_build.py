"""Adjudicate the 5x code-index build anomaly (VERDICT r11 item 3).

Prior readings: 23.3 and 27.4 units/s at 5x vs 47.1 at 20x — backwards
under the n*sqrt(n) build law (per-unit cost should RISE with scale).
Fitting a + b*n*sqrt(n) to the two prior walls gives a fixed cost
a ~ 920 s, which is either (a) a real constant term in the build path
or (b) the session-cold first-build effect both prior probes suffered
(each ran the 5x build first, under documented host drift).

This probe runs on a clean idle host: generate the 5x corpus once
(cached, materialized outside all timings), then TWO back-to-back
CodeIndex builds to fresh paths, timing each and every internal build
stage (parse/encode/plaid/bm25) via wall splits around the public API.
If build2 ~= build1 ~= 1140 s the fixed cost is real -> profile; if
build2 collapses toward ~300 s (the law's expectation) the anomaly is
session-cold + drift and the SCALING row gets corrected.

Usage: python tools/probe_5x_build.py [replicas] [n_builds]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "/root/testdata/sf0.1"


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    n_builds = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    from pyspark.sql import functions as F

    from next_plaid_spark import queries as q
    from next_plaid_spark.operators.code_index import CodeIndex
    from next_plaid_spark.session import get_spark

    spark = get_spark("probe-5x-build")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    n_base = base.count()
    reps = spark.range(replicas).select(F.col("id").alias("rep"))
    docs = (
        base.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep") * n_base).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" rep"),
                     F.col("rep").cast("string")).alias("text"),
        )
    )
    files = q._code_corpus_from_docs(docs).repartition(
        spark.sparkContext.defaultParallelism).cache()
    n_files = files.count()  # materialize outside all build timings

    out: dict = {"replicas": replicas, "files": int(n_files), "builds": []}
    for i in range(n_builds):
        path = os.path.join(
            tempfile.mkdtemp(prefix=f"probe5x_b{i}_"), "index")
        t0 = time.time()
        idx = CodeIndex.build(files, path, bucket_tokens=32)
        wall = round(time.time() - t0, 2)
        rec = {
            "build_s": wall,
            "units": int(idx.plaid.meta.num_documents),
            "units_per_sec": round(idx.plaid.meta.num_documents / wall, 1),
        }
        out["builds"].append(rec)
        print(json.dumps({"build": i, **rec}), flush=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

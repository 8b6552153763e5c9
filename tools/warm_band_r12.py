"""Same-session warm bands for the r11 verdict's flagged movers.

VERDICT r11 items 2 and 5: `ir_eval_bm25` (3.02 → 10.08 s, 3.3×),
`events_rolling` (0.35 → 0.90 s, 2.6×), `sample_per_source` (0.48 →
0.93 s, 1.9×) moved beyond the uniform host-drift shift and none had a
band; `code_search_qps` (batch50) is a new axis with no history. Same
discipline as r11's settlement of the r10 flags: reproduce each bench
point's setup ONCE, then run the timed section N times back-to-back in
one session — cold-start + drift lands in run 1, a plan regression
shows up in every run. Prints one JSON line per probe.

Usage: python tools/warm_band_r12.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from next_plaid_spark import queries as q
    from next_plaid_spark.session import get_spark

    spark = get_spark("warm_band_r12")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        try:
            df.write.format("noop").mode("overwrite").save()
        except Exception:
            df.count()

    # the three flagged registry entries, exactly as the bench times them
    for name in ("ir_eval_bm25", "events_rolling", "sample_per_source"):
        fn = q.queries()[name]
        walls = []
        for _ in range(runs):
            t0 = time.time()
            force(fn(spark, sf_dir))
            walls.append(round(time.time() - t0, 3))
        print(json.dumps({"probe": name, "sf_dir": sf_dir,
                          "walls": walls}), flush=True)

    # code_search batch50 (the code_search_qps axis): prebuilt index, the
    # batch-native search_batch at the serving config — bench geometry
    from pyspark.sql import functions as F

    from next_plaid_spark.plans.searcher import SearchParams

    ci = q._code_index(spark, sf_dir)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_q = 50
    queries = docs.filter(F.col("doc_id") < n_q).select(
        F.col("doc_id").alias("query_id"),
        F.substring("text", 1, 64).alias("text"))
    serving = SearchParams(n_ivf_probe=8, centroid_score_threshold=0.4,
                           n_full_scores=256, keep_best_cell=True)
    walls = []
    for _ in range(runs):
        t0 = time.time()
        force(ci.search_batch(queries, top_k=10, params=serving))
        walls.append(round(time.time() - t0, 3))
    print(json.dumps({"probe": "code_search_batch50", "sf_dir": sf_dir,
                      "walls": walls,
                      "qps_warm": round(n_q / min(walls), 1)}), flush=True)


if __name__ == "__main__":
    main()

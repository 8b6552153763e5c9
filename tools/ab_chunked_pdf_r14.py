"""Interleaved A/B of the chunked strategy's driver-side pdf slicing (r14).

A = HEAD behavior: search() hands the already-collected token pdf to
_approx_chunked, which slices chunks driver-side (no per-chunk toPandas,
no distinct-qids job).  B = prior behavior: the pdf is withheld at the
_approx_chunked boundary, so every chunk re-collects its token slice.

Replicates bench.py's ``plaid_search_batch500_chunked4`` segment exactly
(same corpus, same budget, same noop force). Usage:
    python tools/ab_chunked_pdf_r14.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    os.environ.setdefault("SPARK_GRAFT_SF_DIR", sf_dir)

    from pyspark.sql import functions as F

    from next_plaid_spark import queries as q
    from next_plaid_spark.encoding import encode_queries
    from next_plaid_spark.plans.searcher import BatchSearcher, SearchParams
    from next_plaid_spark.session import get_spark

    spark = get_spark("ab-chunked-pdf")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    idx = q._plaid_index(spark, sf_dir)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_q = 500
    batch_queries = docs.filter(F.col("doc_id") < n_q).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    est = 8 * n_q * idx.meta.k * 4

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    orig = BatchSearcher._approx_chunked

    def chunked_no_pdf(self, *args, **kw):
        kw["qt_pdf"] = None  # B: withhold the pdf -> per-chunk collects
        return orig(self, *args, **kw)

    def run(tag: str) -> tuple[float, int]:
        searcher = BatchSearcher(
            idx, SearchParams(top_k=10, n_full_scores=256),
            approx_strategy="chunked", broadcast_budget_bytes=max(1, est // 4),
        )
        sc = spark.sparkContext
        sc.setJobGroup(tag, f"ab-chunked-pdf {tag}")
        t0 = time.time()
        force(searcher.search(encode_queries(batch_queries)))
        dt = time.time() - t0
        searcher.release()
        n_jobs = len(sc.statusTracker().getJobIdsForGroup(tag))
        sc.setJobGroup(None, None)
        return dt, n_jobs

    # warmup both variants once, then interleave
    run("warmup-A")
    BatchSearcher._approx_chunked = chunked_no_pdf
    run("warmup-B")
    BatchSearcher._approx_chunked = orig

    a, b = [], []
    for i in range(reps):
        # alternate which variant goes first so warming cancels out
        first_b = i % 2 == 1
        if first_b:
            BatchSearcher._approx_chunked = chunked_no_pdf
            b.append(run(f"B{i}"))
            BatchSearcher._approx_chunked = orig
            a.append(run(f"A{i}"))
        else:
            a.append(run(f"A{i}"))
            BatchSearcher._approx_chunked = chunked_no_pdf
            b.append(run(f"B{i}"))
            BatchSearcher._approx_chunked = orig
    print("A (pdf slicing) walls:", [round(x, 2) for x, _ in a],
          "jobs:", [n for _, n in a])
    print("B (per-chunk collect) walls:", [round(x, 2) for x, _ in b],
          "jobs:", [n for _, n in b])
    spark.stop()


if __name__ == "__main__":
    main()

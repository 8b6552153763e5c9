"""Stage-level profiling of the filtered code-search gate entries.

The r11 gate record showed the F10/F11-filtered entries ~4-5x slower
Spark-side than the unfiltered approx twin at sf0.01 (40.7 s / 49.9 s vs
9.5 s) even with the CodeIndex cached. This tool splits one filtered
search into its stages and times each, so the slow stage is measured,
not guessed.

Usage: python tools/profile_filtered.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def t(label, fn):
    t0 = time.time()
    out = fn()
    print(f"{label:<42s} {time.time() - t0:7.2f} s")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    from pyspark.sql import functions as F

    from next_plaid_spark import queries as q
    from next_plaid_spark.plans.searcher import SearchParams
    from next_plaid_spark.session import get_spark

    spark = get_spark("profile-filtered")
    spark.sparkContext.setLogLevel("ERROR")

    idx = t("CodeIndex build (cached entry path)",
            lambda: q._code_index(spark, sf_dir))
    qtext = q._code_query_text(spark, sf_dir)
    serving = SearchParams(n_ivf_probe=8, centroid_score_threshold=0.4,
                           n_full_scores=256, keep_best_cell=True)

    # warm one unfiltered search first so JVM/codegen warmup doesn't land
    # on the first measured row
    t("warmup: unfiltered approx search",
      lambda: idx.search(qtext, top_k=q.CODE_TOPK, alpha=q.CODE_ALPHA,
                         params=serving).count())

    t("unfiltered approx search (warm)",
      lambda: idx.search(qtext, top_k=q.CODE_TOPK, alpha=q.CODE_ALPHA,
                         params=serving).count())

    # stage splits of the filtered search
    subset = idx._subset(q.CODE_FILTER_REGEX, q.CODE_FILTER_GLOB, None)
    t("subset materialize (regex+glob scan)", lambda: subset.count())

    t("filtered approx search (end-to-end)",
      lambda: idx.search(qtext, regex=q.CODE_FILTER_REGEX,
                         include_glob=q.CODE_FILTER_GLOB,
                         top_k=q.CODE_TOPK, alpha=q.CODE_ALPHA,
                         params=serving).count())

    t("filtered exact search (end-to-end)",
      lambda: idx.search(qtext, regex=q.CODE_FILTER_REGEX,
                         include_glob=q.CODE_FILTER_GLOB,
                         top_k=q.CODE_TOPK, alpha=q.CODE_ALPHA,
                         params=idx.exact_search_params(q.CODE_TOPK)).count())

    # components in isolation
    from next_plaid_spark.encoding import encode_queries
    qdf = spark.createDataFrame([(0, qtext)], "query_id long, text string")
    qt = encode_queries(qdf, dim=idx.meta["dim"],
                        max_tokens=idx.meta["query_max_tokens"])
    t("encode query", lambda: qt.count())

    n_docs = idx.plaid.meta.num_documents
    fetch_k = min(max(20 * q.CODE_TOPK, 200), max(n_docs, q.CODE_TOPK))

    from next_plaid_spark.plans.searcher import BatchSearcher
    searcher = BatchSearcher(idx.plaid)
    import dataclasses
    p = dataclasses.replace(serving, top_k=fetch_k)
    t("semantic leg: filtered funnel only",
      lambda: searcher.search(qt, subset=subset, params=p).count())
    searcher.release()
    t("semantic leg again (captures recompute)",
      lambda: searcher.search(qt, subset=subset, params=p).count())
    searcher.release()

    t("keyword leg: bm25 filtered only",
      lambda: idx.bm25.search(qdf, k=fetch_k, subset=subset).count())

    sem = searcher.search(qt, subset=subset, params=p).select(
        "query_id", "doc_id", "score")
    kw = idx.bm25.search(qdf, k=fetch_k, subset=subset).select(
        "query_id", "doc_id", "score")
    from next_plaid_spark.operators.colgrep import apply_ranking
    from next_plaid_spark.operators.fusion import hybrid_search
    fused = hybrid_search(sem, kw, mode="relative_score",
                          alpha=q.CODE_ALPHA, k=fetch_k).select(
        F.col("doc_id").alias("unit_id"), "score")
    t("fusion + ranking tail (on top of legs)",
      lambda: apply_ranking(fused, idx.units, qtext,
                            top_k=q.CODE_TOPK).count())


if __name__ == "__main__":
    main()

"""Same-session warm-band probe for drifted bench walls (SCALING.md §bands).

Reproduces a bench point's exact setup ONCE per session, then runs the
timed section N times back-to-back — separating one-time materialization
(cache fill, codegen) + host drift from plan regressions, the discipline
that settled bm25_phrase_topk in r10. Run:

    python tools/warm_band.py [sf_dir] [runs]

Covers the two r10 watch items: ``duplicate_spans`` (+41% r9→r10) and
``clustered_nfull4096_wall`` (+75%). Prints one JSON line per probe.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    from next_plaid_spark import queries as q
    from next_plaid_spark.session import get_spark

    spark = get_spark("warm_band")

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # -- duplicate_spans: the registry entry, run N times back-to-back ----
    fn = q.queries()["duplicate_spans"]
    walls = []
    for _ in range(runs):
        t0 = time.time()
        force(fn(spark, sf_dir))
        walls.append(round(time.time() - t0, 3))
    print(json.dumps({"probe": "duplicate_spans", "sf_dir": sf_dir,
                      "walls": walls}))

    # -- clustered_nfull4096_wall: bench's clustered sweep point, same
    # geometry/seed, setup (corpus + index + truth) outside the band ------
    from next_plaid_spark.encoding import clustered_token_corpus
    from next_plaid_spark.plans.builder import IndexBuilder
    from next_plaid_spark.plans.searcher import BatchSearcher, SearchParams

    ctoks, cclu = clustered_token_corpus(
        spark, n_docs=2000, tokens_per_doc=4, dim=8, n_clusters=250, seed=11)
    ctoks = ctoks.cache()
    cidx = IndexBuilder(spark, k=256).build(
        ctoks, tempfile.mkdtemp(prefix="warmband_cidx_") + "/idx")
    cqt = ctoks.filter(F.col("doc_id") % 20 == 0).select(
        F.col("doc_id").alias("query_id"), "token_idx", "vec").cache()
    cqt.count()  # materialize the query cache outside the timed section
    walls = []
    for _ in range(runs):
        s = BatchSearcher(cidx, SearchParams(
            top_k=10, n_ivf_probe=8, n_full_scores=4096,
            keep_best_cell=True))
        t0 = time.time()
        got = {}
        for r in s.search(cqt).collect():
            got.setdefault(r.query_id, set()).add(r.doc_id)
        walls.append(round(time.time() - t0, 3))
    print(json.dumps({"probe": "clustered_nfull4096_wall",
                      "n_queries": len(got), "walls": walls}))


if __name__ == "__main__":
    main()

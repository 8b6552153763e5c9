"""r14 SCALING probe: search read amplification over a tiered-append
snapshot chain vs a fresh one-shot build of the same corpus.

The tiered-file append layout (operators/update.py) makes ingest
O(batch) per batch — this probe answers the converse question: does the
multi-file bucket layout make SEARCH slower? Builds the sf corpus once
as a one-shot bucketed index (one file per bucket) and once as a chain
of tiered appends (log-bounded files per bucket), then runs the same
batch funnel search over both, interleaved A/B/A/B to cancel warmup
drift. Also reports per-bucket file counts so the read-amplification
bound is visible next to the walls.

Usage: python tools/read_amp_r14.py [sf_dir] [n_appends]
Prints one JSON line; paste the summary into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from next_plaid_spark.encoding import encode_documents, encode_queries  # noqa: E402
from next_plaid_spark.operators.update import update_index  # noqa: E402
from next_plaid_spark.plans.builder import IndexBuilder  # noqa: E402
from next_plaid_spark.plans.searcher import BatchSearcher, SearchParams  # noqa: E402
from next_plaid_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_appends = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("read-amp-r14", shuffle_partitions=8)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).cache()
    n_docs = docs.count()

    root = tempfile.mkdtemp(prefix="read_amp_r14_")
    toks = encode_documents(docs)

    oneshot = IndexBuilder(spark, nbits=4, seed=42, bucket_tokens=8).build(
        toks, f"{root}/oneshot")

    base_cut = n_docs // 2
    chained = IndexBuilder(spark, nbits=4, seed=42, bucket_tokens=8).build(
        encode_documents(docs.filter(F.col("doc_id") % n_docs < base_cut)),
        f"{root}/c0")
    step = (n_docs - base_cut) // n_appends
    for i in range(n_appends):
        lo = base_cut + i * step
        hi = n_docs if i == n_appends - 1 else base_cut + (i + 1) * step
        chained = update_index(
            spark, chained,
            encode_documents(docs.filter(
                (F.col("doc_id") % n_docs >= lo)
                & (F.col("doc_id") % n_docs < hi))),
            f"{root}/c{i + 1}")

    def n_files(idx):
        d = os.path.join(idx.path, "tokens_bucketed")
        return len([f for f in os.listdir(d) if not f.startswith(("_", "."))])

    queries = docs.filter(F.col("doc_id") < 100).select(
        F.col("doc_id").alias("query_id"), "text")
    qt = encode_queries(queries).cache()
    qt.count()
    params = SearchParams(top_k=10, n_full_scores=256)

    walls = {"oneshot": [], "chained": []}
    searchers = {"oneshot": BatchSearcher(oneshot, params),
                 "chained": BatchSearcher(chained, params)}
    for _round in range(3):  # interleaved A/B x3; drop the warmup round
        for name, srch in searchers.items():
            t0 = time.monotonic()
            srch.search(qt).count()
            walls[name].append(round(time.monotonic() - t0, 2))

    print(json.dumps({
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_appends": n_appends,
        "oneshot_token_files": n_files(oneshot),
        "chained_token_files": n_files(chained),
        "oneshot_search_walls": walls["oneshot"],
        "chained_search_walls": walls["chained"],
        "warm_ratio_chained_over_oneshot": round(
            sum(walls["chained"][1:]) / sum(walls["oneshot"][1:]), 2),
    }))


if __name__ == "__main__":
    main()

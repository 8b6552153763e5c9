"""Second-scale evidence BEYOND the driver's largest testdata (sf0.1).

Synthesizes an sf0.5- and sf1-equivalent corpus by replicating the sf0.1
documents table with doc_id offsets and a per-replica vocabulary marker
(keeps content-hash ids and dedup semantics sane), then measures the two
headline index/search costs at each scale, bucketed vs unbucketed:

- plaid index build wall (train-on-sample k-means + fused assign/quantize)
- batch500 search wall (the QPS analog)
- executed-plan exchange count of the batch500 search

This answers the two claims that were single-scale extrapolations until
now (SCALING.md): QPS scaling beyond sf0.1, and the bucketed layout's
payoff growing with corpus size. Appends a section to SCALING.md and
prints one JSON line.

Usage: python tools/scale_beyond.py [replicas ...]   (default: 5 10)
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
    replicas = [int(a) for a in sys.argv[1:]] or [5, 10]

    from pyspark.sql import functions as F

    from next_plaid_spark import queries as q
    from next_plaid_spark.encoding import encode_documents, encode_queries
    from next_plaid_spark.plans.builder import IndexBuilder
    from next_plaid_spark.plans.searcher import BatchSearcher, SearchParams
    from next_plaid_spark.session import get_spark

    spark = get_spark("scale-beyond")
    spark.sparkContext.setLogLevel("ERROR")

    def exchanges(df) -> int:
        s = df._jdf.queryExecution().executedPlan().toString()
        return s.count("Exchange ") - s.count("ReusedExchange")

    base = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    n_base = base.count()
    out: dict = {"base_docs": n_base, "scales": {}}

    for r in replicas:
        tag = f"{r}x"
        # replicate with id offsets; the replica marker token keeps each
        # copy's text distinct (no degenerate 100%-duplicate corpus)
        reps = spark.range(r).select(F.col("id").alias("rep"))
        docs = (
            base.crossJoin(F.broadcast(reps))
            .select(
                (F.col("doc_id") + F.col("rep") * n_base).alias("doc_id"),
                F.concat(F.col("text"), F.lit(" rep"),
                         F.col("rep").cast("string")).alias("text"),
            )
            .repartition(spark.sparkContext.defaultParallelism)
        )
        tokens = encode_documents(docs).cache()
        tokens.count()  # materialize outside timings

        scale: dict = {"docs": n_base * r}
        # two passes per variant; the FIRST is the warm-up (JIT, shuffle
        # machinery, python workers at this scale) and only the second is
        # recorded — the r9 sortBy A/B showed cold-vs-warm ordering
        # artifacts of 2x swamping the real deltas at these scales
        for _pass in ("warm", "record"):
            for label, buckets in (("bucketed", 32), ("unbucketed", None)):
                path = os.path.join(
                    tempfile.mkdtemp(prefix=f"scale_{tag}_{label}_"), "index")
                t0 = time.time()
                idx = IndexBuilder(spark, nbits=4, seed=42,
                                   bucket_tokens=buckets).build(tokens, path)
                build_s = round(time.time() - t0, 2)

                queries = docs.filter(F.col("doc_id") < 500).select(
                    F.col("doc_id").alias("query_id"), "text")
                searcher = BatchSearcher(
                    idx, SearchParams(top_k=10, n_full_scores=256))
                res = searcher.search(encode_queries(queries))
                t0 = time.time()
                try:
                    res.write.mode("overwrite").format("noop").save()
                except Exception:
                    res.count()
                if _pass == "record":
                    scale[f"build_{label}_s"] = build_s
                    scale[f"batch500_{label}_s"] = round(time.time() - t0, 2)
                    scale[f"batch500_{label}_exchanges"] = exchanges(res)
        scale["batch500_qps_bucketed"] = round(
            500 / scale["batch500_bucketed_s"], 1)
        out["scales"][tag] = scale
        tokens.unpersist()

    print(json.dumps(out))

    lines = [
        "",
        "## Beyond sf0.1 — synthetic 5x / 10x corpus (tools/scale_beyond.py)",
        "",
        "sf0.1 documents replicated with id offsets + a replica vocabulary",
        "marker; same build/search configuration as the bench headline.",
        "",
        "| scale | docs | build bucketed | build plain | batch500 bucketed"
        " | batch500 plain | exch bucketed | exch plain | QPS (bucketed) |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for tag, s in out["scales"].items():
        lines.append(
            f"| {tag} | {s['docs']:,} | {s['build_bucketed_s']} s "
            f"| {s['build_unbucketed_s']} s | {s['batch500_bucketed_s']} s "
            f"| {s['batch500_unbucketed_s']} s "
            f"| {s['batch500_bucketed_exchanges']} "
            f"| {s['batch500_unbucketed_exchanges']} "
            f"| {s['batch500_qps_bucketed']} |")
    lines.append("")
    with open(os.path.join(REPO, "SCALING.md"), "a") as fh:
        fh.write("\n".join(lines))
    print("appended to SCALING.md")


if __name__ == "__main__":
    main()

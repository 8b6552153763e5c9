"""Code-index scale probe beyond sf0.1 (the r10 verdict's ask #5).

Replicates the sf0.1 documents table with id offsets + a replica marker
(the same recipe as tools/scale_beyond.py), regenerates the synthetic
code package from it — function/anchor names carry doc_id/grp, so every
replica's units stay name-unique and the global call graph keeps its
real shape instead of 50-way name fan-in — then measures, per scale:

- CodeIndex.build wall + units/s (the `colgrep index` cost)
- funnel search wall at the SERVING config (n_probe=8, t_cs=0.4,
  n_full=256), single query, warm-disciplined (2 runs, record the 2nd)
- batch50 search_batch wall + QPS at the same config (the flatness claim)

Appends a section to SCALING.md and prints one JSON line.

Usage: python tools/scale_code.py [replicas ...]   (default: 5 20 50)
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
    replicas = [int(a) for a in sys.argv[1:]] or [5, 20, 50]

    from pyspark.sql import functions as F

    from next_plaid_spark import queries as q
    from next_plaid_spark.operators.code_index import CodeIndex
    from next_plaid_spark.plans.searcher import SearchParams
    from next_plaid_spark.session import get_spark

    spark = get_spark("scale-code")
    spark.sparkContext.setLogLevel("ERROR")

    base = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    n_base = base.count()
    qtext = q._code_query_text(spark, BASE)
    serving = SearchParams(n_ivf_probe=8, centroid_score_threshold=0.4,
                           n_full_scores=256, keep_best_cell=True)
    out: dict = {"base_docs": n_base, "query": qtext, "scales": {}}

    for r in replicas:
        tag = f"{r}x"
        reps = spark.range(r).select(F.col("id").alias("rep"))
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
        files.count()  # materialize outside the build timing

        path = os.path.join(tempfile.mkdtemp(prefix=f"scale_code_{tag}_"),
                            "index")
        t0 = time.time()
        idx = CodeIndex.build(files, path, bucket_tokens=32)
        build_s = round(time.time() - t0, 2)
        n_units = idx.plaid.meta.num_documents

        scale: dict = {
            "units": int(n_units),
            "build_s": build_s,
            "units_per_sec": round(n_units / build_s, 1),
        }
        # warm discipline: 2 runs, record the second (same as scale_beyond)
        for _pass in ("warm", "record"):
            t0 = time.time()
            res = idx.search(qtext, top_k=q.CODE_TOPK, alpha=q.CODE_ALPHA,
                             params=serving)
            n_rows = res.count()
            if _pass == "record":
                scale["search_serving_s"] = round(time.time() - t0, 2)
                scale["search_rows"] = n_rows

        n_q = 50
        queries = docs.filter(F.col("doc_id") < n_q).select(
            F.col("doc_id").alias("query_id"),
            F.substring("text", 1, 64).alias("text"))
        for _pass in ("warm", "record"):
            t0 = time.time()
            res = idx.search_batch(queries, top_k=10, params=serving)
            try:
                res.write.mode("overwrite").format("noop").save()
            except Exception:
                res.count()
            if _pass == "record":
                scale["batch50_s"] = round(time.time() - t0, 2)
                scale["code_qps"] = round(n_q / scale["batch50_s"], 1)

        # incremental 2-file update at this scale: with units/ bucketed by
        # file hash only dirty buckets rewrite and only changed units
        # re-encode, so this should stay ~flat while build_s grows n*sqrt(n)
        touched = [r.path for r in files.select("path")
                   .orderBy("path").limit(2).collect()]
        new_files = files.withColumn(
            "content",
            F.when(F.col("path").isin(touched),
                   F.concat(F.col("content"),
                            F.lit("\ndef scale_touch():\n"
                                  "    return scaletouched\n"))
                   ).otherwise(F.col("content")))
        upd_path = os.path.join(tempfile.mkdtemp(prefix=f"scale_code_upd_{tag}_"),
                                "index")
        t0 = time.time()
        idx.update(new_files, upd_path)
        scale["update_2file_s"] = round(time.time() - t0, 2)

        out["scales"][tag] = scale
        files.unpersist()

    print(json.dumps(out))

    lines = [
        "",
        "## Code index beyond sf0.1 — replicated corpus (tools/scale_code.py)",
        "",
        "sf0.1 documents replicated with id offsets, code package",
        "regenerated (names stay unique per replica, so the call graph",
        "keeps its shape); CodeIndex built bucketed, served at the",
        "serving config (n_probe=8, t_cs=0.4, n_full=256).",
        "",
        "| scale | units | build | units/s | search (1q, warm) "
        "| batch50 | code QPS | 2-file update |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for tag, s in out["scales"].items():
        lines.append(
            f"| {tag} | {s['units']:,} | {s['build_s']} s "
            f"| {s['units_per_sec']} | {s['search_serving_s']} s "
            f"| {s['batch50_s']} s | {s['code_qps']} "
            f"| {s['update_2file_s']} s |")
    lines.append("")
    with open(os.path.join(REPO, "SCALING.md"), "a") as fh:
        fh.write("\n".join(lines))
    print("appended to SCALING.md")


if __name__ == "__main__":
    main()

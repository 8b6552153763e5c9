"""Phase-timed PLAID index build (r14 opt round, session 6).

Replicates bench.py's ``plaid_index_build`` segment EXACTLY (same warmups,
including the mapInPandas worker boot) but times each builder phase from
the driver: cache+stats, kmeans, codec, assign+quantize+write. Run twice
in-process to show cold vs warm.

Usage: python tools/profile_build_phases_s6.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from next_plaid_spark import queries as q
    from next_plaid_spark.session import get_spark

    spark = get_spark("profile-build-phases")
    spark.sparkContext.setLogLevel("ERROR")

    # bench-identical warmup (bench.py lines: range-sum, groupBy, noop
    # mapInPandas to boot the Python worker pool)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    warm.groupBy("source").count().collect()

    def _noop_batches(it):
        for pdf in it:
            yield pdf

    warm.repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))) \
        .select("doc_id").mapInPandas(_noop_batches, "doc_id long") \
        .write.mode("overwrite").format("noop").save()

    from next_plaid_spark.operators.codec import (
        assign_and_quantize,
        train_codec_from_tokens,
    )
    from next_plaid_spark.operators.kmeans import estimate_k, train_kmeans
    from next_plaid_spark.plans.builder import IndexBuilder
    from next_plaid_spark.sources.index_store import IndexMeta, write_index

    for rep in range(2):
        path = tempfile.mkdtemp(prefix=f"prof_build_{rep}_") + "/index"
        t_all = time.time()
        marks = [("start", time.time())]

        doc_tokens = q._doc_tokens(spark, sf_dir)
        marks.append(("encode-frame-built", time.time()))

        doc_tokens = doc_tokens.select(
            F.col("doc_id").cast("long"),
            F.col("token_idx").cast("int"),
            F.col("vec"),
        ).cache()
        stats = doc_tokens.agg(
            F.count("*").alias("n"), F.countDistinct("doc_id").alias("d"),
            F.max(F.size("vec")).alias("dim"),
        ).collect()[0]
        n_tokens, n_docs = stats.n, stats.d
        marks.append(("cache+stats", time.time()))

        model = train_kmeans(
            doc_tokens, k=estimate_k(n_tokens), seed=42, iters=4,
            n_tokens=n_tokens, n_docs=n_docs,
        )
        marks.append(("kmeans", time.time()))

        codec = train_codec_from_tokens(
            doc_tokens, model.centroids, nbits=4, seed=42, n_rows=n_tokens,
        )
        marks.append(("codec", time.time()))

        tokens_out = assign_and_quantize(doc_tokens, model.centroids, codec)
        meta = IndexMeta(
            k=model.k, dim=model.dim, nbits=4,
            num_documents=n_docs, num_embeddings=n_tokens,
            avg_doclen=n_tokens / max(n_docs, 1), codec=codec,
        )
        buckets = int(os.environ.get("SPARK_GRAFT_BUCKET_TOKENS", "32")) or None
        idx = write_index(
            spark, path, tokens_coded=tokens_out,
            centroids=model.centroids, meta=meta,
            bucket_tokens=buckets,
        )
        marks.append(("assign+quantize+write", time.time()))
        doc_tokens.unpersist()

        total = time.time() - t_all
        print(f"== rep {rep}: total {total:.2f}s  (k={model.k}, "
              f"n_tokens={n_tokens}, n_docs={n_docs}, dim={model.dim})")
        for (name, t1), (_, t0) in zip(marks[1:], marks[:-1]):
            print(f"   {name:<26} {t1 - t0:6.2f}s")
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)


if __name__ == "__main__":
    main()

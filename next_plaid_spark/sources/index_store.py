"""Index persistence — the Spark analog of the reference's NPY artifact
directory (SURVEY.md §1.2, next-plaid/src/index.rs:551-911).

One index = one directory of Parquet tables + a JSON sidecar:

    <path>/tokens/      doc_id, token_idx, code, residual   (the corpus)
    <path>/centroids/   code, vec                           (small)
    <path>/ivf/         code, doc_ids                       (inverted file)
    <path>/doc_stats/   doc_id, num_tokens, codes  (doclens + codes.npy
                        analogs from one shuffle; readers column-prune)
    <path>/meta.json    k, dim, nbits, codec artifacts, counts

Legacy layouts with separate ``doclens``/``doc_codes`` directories are
still readable (PlaidIndex falls back when ``doc_stats`` is absent).

Differences from the reference by design: no 50k-doc chunking (Spark
partitioning replaces it), no embedding_offset bookkeeping (joins on doc_id
replace pointer arithmetic), no mmap merge step (S3 — multi-file Parquet
reads natively). Atomicity comes from Spark's job commit protocol instead of
temp-file rename (utils.rs:16).

``tokens`` is repartitioned by ``doc_id`` (rerank gathers whole documents)
and ``ivf`` by ``code`` (probe joins on code) — at cluster scale these become
bucketed tables so the search-side joins co-locate without a shuffle.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from next_plaid_spark.session import local_df
from next_plaid_spark.operators.codec import CodecArtifacts


@dataclass
class IndexMeta:
    k: int
    dim: int
    nbits: int
    num_documents: int
    num_embeddings: int
    avg_doclen: float
    codec: CodecArtifacts
    # set when tokens are persisted as a doc_id-bucketed table: catalog
    # table name + bucket count (None = plain parquet directory)
    bucket_table: str | None = None
    n_buckets: int | None = None

    def to_json(self) -> str:
        d = {
            "k": self.k,
            "dim": self.dim,
            "nbits": self.nbits,
            "num_documents": self.num_documents,
            "num_embeddings": self.num_embeddings,
            "avg_doclen": self.avg_doclen,
            "codec": self.codec.to_dict(),
            "next_plaid_spark_version": 1,
        }
        if self.bucket_table:
            d["bucket_table"] = self.bucket_table
            d["n_buckets"] = self.n_buckets
        return json.dumps(d)

    @classmethod
    def from_json(cls, s: str) -> "IndexMeta":
        d = json.loads(s)
        return cls(
            k=d["k"], dim=d["dim"], nbits=d["nbits"],
            num_documents=d["num_documents"], num_embeddings=d["num_embeddings"],
            avg_doclen=d["avg_doclen"], codec=CodecArtifacts.from_dict(d["codec"]),
            bucket_table=d.get("bucket_table"), n_buckets=d.get("n_buckets"),
        )


class PlaidIndex:
    """Handle over a persisted index (load side of MmapIndex,
    index.rs:995-1139 — reborn as lazily-read Parquet tables)."""

    def __init__(self, spark: SparkSession, path: str, meta: IndexMeta):
        self.spark = spark
        self.path = path
        self.meta = meta
        # per-instance memos (r14 opt): a snapshot's dirs are immutable
        # once the PlaidIndex over them exists (updates/deletes/evictions
        # always write a NEW snapshot dir and return a NEW handle), so the
        # file-listing + footer-inference job `spark.read.parquet` runs on
        # every property access — one small Spark job per call, several
        # calls per search — resolves to the same frame every time. Memoize
        # the lazy DataFrame per dir (plan reuse only: every action still
        # scans the parquet files). The catalog-table branch of `tokens` is
        # NOT memoized — catalog state is session-mutable and the lookup
        # runs no job.
        self._df_memo: dict = {}
        self._centroids_memo = None

    def _read_memo(self, key: str, path: str) -> DataFrame:
        df = self._df_memo.get(key)
        if df is None:
            df = self.spark.read.parquet(path)
            self._df_memo[key] = df
        return df

    # -- tables ------------------------------------------------------------
    @property
    def tokens(self) -> DataFrame:
        bt = self.meta.bucket_table
        if bt and self.spark.catalog.tableExists(bt):
            # bucketed catalog table: groupBy(doc_id)/join(doc_id) read the
            # bucket spec and skip the shuffle entirely
            return self.spark.table(bt)
        if bt:
            # bucketed FILES from another session (in-memory catalog lost
            # the table): still valid parquet, just without the bucket
            # metadata — a persistent metastore keeps it at cluster scale.
            # Gated on meta.bucket_table: a leftover tokens_bucketed/ dir
            # from a previous bucketed build must never shadow a plain
            # rebuild's tokens/ (write_index also deletes it, belt+braces).
            pb = os.path.join(self.path, "tokens_bucketed")
            if os.path.isdir(pb):
                return self._read_memo("tokens_bucketed", pb)
        return self._read_memo("tokens", os.path.join(self.path, "tokens"))

    @property
    def centroids_df(self) -> DataFrame:
        return self._read_memo("centroids", os.path.join(self.path, "centroids"))

    @property
    def ivf(self) -> DataFrame:
        return self._read_memo("ivf", os.path.join(self.path, "ivf"))

    @property
    def doclens(self) -> DataFrame:
        p = os.path.join(self.path, "doc_stats")
        if os.path.exists(p):
            # Parquet column pruning: the codes arrays are never scanned
            return self._read_memo("doc_stats", p).select("doc_id", "num_tokens")
        return self._read_memo("doclens", os.path.join(self.path, "doclens"))

    @property
    def doc_codes(self) -> DataFrame | None:
        """(doc_id, codes ARRAY<BIGINT>) — each doc's distinct sorted codes,
        the Spark analog of the reference's per-doc contiguous codes.npy
        rows (index.rs:812-818 + doclens offsets). Precomputed at write
        time (one shared groupBy with doclens in ``doc_stats``) so the
        search-side codes-only stage is a read + semi-join, not a
        per-query-batch corpus aggregation. None for indexes written before
        this table existed (searcher falls back to aggregating)."""
        p = os.path.join(self.path, "doc_stats")
        if os.path.exists(p):
            return self._read_memo("doc_stats", p).select("doc_id", "codes")
        p = os.path.join(self.path, "doc_codes")
        if not os.path.exists(p):
            return None
        return self._read_memo("doc_codes", p)

    def centroids_np(self) -> np.ndarray:
        # collected once per handle (the reference mmaps centroids at index
        # load and keeps them resident; K·dim floats is load-time metadata).
        # The sort moved driver-side: `orderBy("code").collect()` on this
        # tiny frame cost 3 Spark jobs (range-partitioner sampling, sort
        # shuffle, result) per call — codes are unique ints, so a Python
        # sort is value-identical for 1 job.
        if self._centroids_memo is None:
            rows = sorted(self.centroids_df.collect(), key=lambda r: r.code)
            self._centroids_memo = np.asarray(
                [r.vec for r in rows], dtype=np.float32)
        return self._centroids_memo

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "PlaidIndex":
        with open(os.path.join(path, "meta.json")) as f:
            meta = IndexMeta.from_json(f.read())
        return cls(spark, path, meta)


def write_index(
    spark: SparkSession,
    path: str,
    *,
    tokens_coded: DataFrame,
    centroids: np.ndarray,
    meta: IndexMeta,
    token_partitions: int | None = None,
    bucket_tokens: int | None = None,
) -> PlaidIndex:
    os.makedirs(path, exist_ok=True)
    import hashlib as _hl
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import functions as F

    # centroids are a driver-local table with no dependency on the token
    # write — overlap its (dispatch-dominated) job with the corpus-sized
    # tokens write below (guide §2.6 overlap-independent-jobs)
    cent_pool = ThreadPoolExecutor(1)
    cent_fut = cent_pool.submit(write_centroids, spark, path, centroids)
    # try/finally (r15, ADVICE): if the token write below raises, the
    # centroids future must still be joined — otherwise its own exception
    # is swallowed and the non-daemon pool thread leaks past the failure
    try:
        if bucket_tokens:
            # doc_id-bucketed catalog table: ONE shuffle at write time buys
            # shuffle-free groupBy(doc_id)/join(doc_id) for every downstream
            # consumer (doc_stats build below, the rerank kernel's per-doc
            # packing, reconstruction) — the cluster-scale layout the module
            # docstring promises. Data lives inside the index directory
            # (external table); the bucket METADATA lives in the session
            # catalog, so other sessions fall back to plain parquet reads of
            # the same files unless a persistent metastore carries it.
            bt = f"nps_tokens_{_hl.md5(os.path.abspath(path).encode()).hexdigest()[:12]}"
            spark.sql(f"DROP TABLE IF EXISTS {bt}")
            (
                # repartition on the bucket column first: each task then writes
                # exactly ONE file per bucket — the condition under which
                # Spark's scan exposes the sortBy order to sort-merge joins
                # (multiple files per bucket force a corpus re-sort above the
                # scan), and it avoids the writers-x-buckets small-file blowup
                tokens_coded.repartition(bucket_tokens, F.col("doc_id"))
                .write.mode("overwrite")
                .option("path", os.path.join(path, "tokens_bucketed"))
                .bucketBy(bucket_tokens, "doc_id")
                .sortBy("doc_id")
                .saveAsTable(bt)
            )
            meta.bucket_table = bt
            meta.n_buckets = bucket_tokens
            tokens_src = spark.table(bt)
        else:
            # No repartition before the write: nothing downstream relies on
            # doc-co-located token FILES (plain parquet carries no partitioning
            # metadata), so a hash shuffle of the corpus's biggest table here
            # would be pure cost. ``token_partitions`` remains for explicit
            # output-file-count control (round-robin, cheaper than hash).
            out = tokens_coded
            if token_partitions:
                out = out.repartition(token_partitions)
            out.write.mode("overwrite").parquet(os.path.join(path, "tokens"))
            tokens_src = None
            # in-place rebuild hygiene: a stale bucketed table/dir from a prior
            # bucketed build of the same path would otherwise keep serving the
            # OLD corpus through the tokens property's bucketed fast path
            stale_bt = f"nps_tokens_{_hl.md5(os.path.abspath(path).encode()).hexdigest()[:12]}"
            spark.sql(f"DROP TABLE IF EXISTS {stale_bt}")
            stale_pb = os.path.join(path, "tokens_bucketed")
            if os.path.isdir(stale_pb):
                import shutil

                shutil.rmtree(stale_pb, ignore_errors=True)
            meta.bucket_table = None
            meta.n_buckets = None
    finally:
        try:
            cent_fut.result()
        finally:
            cent_pool.shutdown()

    tokens = (tokens_src if tokens_src is not None
              else spark.read.parquet(os.path.join(path, "tokens")))
    # B9 doclens + the per-doc distinct sorted codes (codes.npy analog) in
    # ONE groupBy(doc_id) pass — the only full-corpus shuffle after the
    # encode (and with bucketed tokens, not even that: the bucket spec
    # satisfies the groupBy's distribution requirement); readers project
    # just the column they need (Parquet pruning), so doclens consumers
    # never touch the codes arrays. The pass runs ONCE into a (num_docs-
    # row) cache that feeds BOTH the doc_stats write and the IVF
    # derivation — the IVF used to re-read the just-written doc_stats
    # parquet, serializing the two writes behind a redundant scan; now
    # they overlap from a 2-thread pool (guide §2.6).
    stats_df = (
        tokens.groupBy("doc_id")
        .agg(
            F.count("*").alias("num_tokens"),
            F.array_sort(F.collect_set("code")).alias("codes"),
        )
        .cache()
    )
    stats_df.count()  # fill before the fork so the legs never race it
    with ThreadPoolExecutor(2) as ex:
        futs = [
            ex.submit(
                lambda: stats_df.write.mode("overwrite")
                .parquet(os.path.join(path, "doc_stats"))),
            ex.submit(write_ivf_from_stats_df, stats_df, path, meta.k),
        ]
        for fut in futs:
            fut.result()
    stats_df.unpersist()
    with open(os.path.join(path, "meta.json"), "w") as f:
        f.write(meta.to_json())
    return PlaidIndex(spark, path, meta)


def write_centroids(spark: SparkSession, path: str, centroids: np.ndarray) -> None:
    cdf = local_df(
        spark,
        [(int(i), [float(x) for x in row]) for i, row in enumerate(centroids)],
        "code long, vec array<float>",
    )
    cdf.coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "centroids"))


def write_ivf_from_doc_stats(spark: SparkSession, path: str, k: int) -> None:
    """B8 IVF: sorted, deduped doc list per centroid (index.rs:479-508),
    derived from ``path``/doc_stats — input is each doc's distinct codes
    (≤ doclen rows after explode), not the full token table, and
    (code, doc_id) pairs arrive pre-deduped so collect_list suffices."""
    write_ivf_from_stats_df(
        spark.read.parquet(os.path.join(path, "doc_stats")), path, k)


def write_ivf_from_stats_df(doc_stats: DataFrame, path: str, k: int) -> None:
    """IVF derivation from an in-memory doc_stats frame (the builder's
    cached aggregation) — same values as the path-reading form."""
    (
        doc_stats.select("doc_id", F.explode("codes").alias("code"))
        .groupBy("code")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .repartition(1 if k < 65536 else 32, "code")
        .write.mode("overwrite")
        .parquet(os.path.join(path, "ivf"))
    )

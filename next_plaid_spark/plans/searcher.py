"""Batch PLAID search — the retrieval funnel as one chained DataFrame job.

Reference lifecycle (next-plaid/src/search.rs:327-516, SURVEY.md §2.4):

  Q1  query·centroid scores            — small GEMM per query token
  Q2  IVF probe: top n_ivf_probe cells per token (default 8)
  Q3  prune cells with max score < t_cs (default 0.4)
  Q4  subset-aware probe scaling (filtered search)
  Q5  candidate docs = ∪ probed cells' IVF lists (∩ subset)
  Q6  approximate MaxSim on codes only (no residual reads)
  Q7  keep top n_full_scores (default 4096) by approx score
  Q8  decompress budget: top max(n_full/4, k)
  Q9  exact MaxSim on decompressed survivors
  Q10 final top-k

Spark realization: every step is a join/groupBy/window over the query
DataFrame — batch search (Q11) is the natural mode, not a loop. The probe
(Q1/Q2) is the only UDF stage (argpartition over a [q_tokens, K] GEMM);
everything downstream is Catalyst-planned. Column pruning means Q6 never
reads the ``residual`` column — the Parquet scan for the approx stage fetches
(doc_id, code) only, the analog of the reference's codes-only pass.

Skew note (SURVEY §7): natural-language IVF cells are Zipfian. The Q5/Q6
joins run with AQE skew-join splitting; at extreme skew, salt ``code``.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from next_plaid_spark.functions.vector import dot
from next_plaid_spark.operators.codec import decompress
from next_plaid_spark.operators.maxsim import maxsim_scores_relational, topk
from next_plaid_spark.sources.index_store import PlaidIndex


@dataclass
class SearchParams:
    """Defaults mirror search.rs:54-69."""
    top_k: int = 10
    n_ivf_probe: int = 8
    n_full_scores: int = 4096
    centroid_score_threshold: float = 0.4
    # subset probe scaling cap (search.rs:370-382)
    max_probe_scale: int = 16


class BatchSearcher:
    def __init__(self, index: PlaidIndex, params: SearchParams | None = None):
        self.index = index
        self.params = params or SearchParams()
        self._centroids = index.centroids_np()

    # -- Q1 + Q2: probe ----------------------------------------------------
    def _probe(self, query_tokens: DataFrame, n_probe: int) -> DataFrame:
        """(query_id, token_idx, vec) → (query_id, token_idx, code, cscore):
        top n_probe centroids per query token."""
        c = np.ascontiguousarray(self._centroids, dtype=np.float32)

        def probe(batches):
            import pandas as pd

            for pdf in batches:
                if not len(pdf):
                    continue
                x = np.asarray([np.asarray(v, dtype=np.float32) for v in pdf["vec"]])
                scores = x @ c.T  # [rows, K]
                n = min(n_probe, scores.shape[1])
                top = np.argpartition(scores, -n, axis=1)[:, -n:]
                rows = []
                for i, (qid, tid) in enumerate(zip(pdf["query_id"], pdf["token_idx"])):
                    for j in top[i]:
                        rows.append((qid, tid, int(j), float(scores[i, j])))
                yield pd.DataFrame(
                    rows, columns=["query_id", "token_idx", "code", "cscore"]
                )

        return query_tokens.select("query_id", "token_idx", "vec").mapInPandas(
            probe, schema="query_id long, token_idx int, code long, cscore double"
        )

    # -- the funnel ---------------------------------------------------------
    def search(
        self,
        query_tokens: DataFrame,
        *,
        subset: DataFrame | None = None,
        params: SearchParams | None = None,
    ) -> DataFrame:
        """query_tokens(query_id, token_idx, vec) [+ subset(doc_id)]
        → (query_id, doc_id, score, rank) top-k per query."""
        p = params or self.params
        idx = self.index
        # the query-token DF feeds four plan branches (probe, approx-score
        # join, rerank join, top-k) — cache it once; it is query-batch-sized
        query_tokens = query_tokens.cache()

        n_probe = p.n_ivf_probe
        if subset is not None:
            # Q4: widen the probe when the filter is selective
            # (n_probe · n_docs/|subset|, capped — search.rs:370-382)
            subset = subset.select(F.col("doc_id").cast("long")).distinct().cache()
            subset_len = subset.count()
            if subset_len > 0:
                scale = min(
                    max(1, int(idx.meta.num_documents / subset_len)), p.max_probe_scale
                )
                n_probe = min(p.n_ivf_probe * scale, idx.meta.k)

        probed = self._probe(query_tokens, n_probe)

        # Q3: prune probed cells whose best score over query tokens < t_cs
        cell_max = probed.groupBy("query_id", "code").agg(
            F.max("cscore").alias("cell_max")
        )
        cells = cell_max.filter(
            F.col("cell_max") >= p.centroid_score_threshold
        ).select("query_id", "code")

        # Q5: candidates = ∪ IVF lists of surviving cells (∩ subset)
        ivf = idx.ivf
        if subset is not None:
            # eligible-centroid pruning under filter (search.rs:350-364):
            # only cells containing subset docs can contribute
            ivf = (
                ivf.select("code", F.explode("doc_ids").alias("doc_id"))
                .join(subset, "doc_id", "left_semi")
                .groupBy("code")
                .agg(F.collect_list("doc_id").alias("doc_ids"))
            )
        candidates = (
            cells.join(ivf, "code")
            .select("query_id", F.explode("doc_ids").alias("doc_id"))
            .distinct()
        )

        # Q6: approximate scoring on codes only — never touches residuals,
        # so the tokens scan prunes to (doc_id, code). Order matters at
        # scale: semi-join the corpus down to candidate docs BEFORE the
        # distinct, otherwise the dedup shuffles the full corpus per batch
        # (Catalyst won't push a join under an aggregate on its own).
        cand_docs = candidates.select("doc_id").distinct()
        doc_codes = (
            idx.tokens.join(cand_docs, "doc_id", "left_semi")
            .select("doc_id", "code")
            .distinct()
        )
        cand_codes = candidates.join(doc_codes, "doc_id").select(
            "query_id", "doc_id", "code"
        )
        needed_scores = (
            cand_codes.select("query_id", "code")
            .distinct()
            .join(F.broadcast(idx.centroids_df.withColumnRenamed("vec", "cvec")), "code")
            .join(
                query_tokens.select(
                    "query_id",
                    F.col("token_idx").alias("q_token_idx"),
                    F.col("vec").alias("qvec"),
                ),
                "query_id",
            )
            .select(
                "query_id", "code", "q_token_idx",
                dot(F.col("qvec"), F.col("cvec")).alias("cscore"),
            )
        )
        approx = (
            cand_codes.join(needed_scores, ["query_id", "code"])
            .groupBy("query_id", "doc_id", "q_token_idx")
            .agg(F.max("cscore").alias("max_c"))
            .groupBy("query_id", "doc_id")
            .agg(F.sum("max_c").alias("approx_score"))
        )

        # Q7 + Q8: approx top n_full_scores, then decompress budget n/4
        budget = max(p.n_full_scores // 4, p.top_k)
        w = Window.partitionBy("query_id").orderBy(
            F.col("approx_score").desc(), F.col("doc_id").asc()
        )
        survivors = (
            approx.withColumn("arank", F.row_number().over(w))
            .filter(F.col("arank") <= min(p.n_full_scores, budget))
            .select("query_id", "doc_id")
        )

        # Q9: decompress survivors and exact-MaxSim them
        surv_tokens = idx.tokens.join(
            survivors.select("doc_id").distinct(), "doc_id", "left_semi"
        )
        decompressed = decompress(surv_tokens, self._centroids, idx.meta.codec)
        pair_tokens = decompressed.join(survivors, "doc_id").select(
            "query_id", "doc_id", "token_idx", "vec"
        )
        # restrict the MaxSim cross to each query's own survivor docs:
        # tag doc vectors with query_id and reuse the relational kernel
        # per (query, doc) pair via groupBy on both keys.
        qt = query_tokens.select(
            "query_id", F.col("token_idx").alias("q_token_idx"),
            F.col("vec").alias("q_vec"),
        )
        pairs = pair_tokens.join(qt, "query_id").select(
            "query_id", "doc_id", "q_token_idx",
            dot(F.col("q_vec"), F.col("vec")).alias("dp"),
        )
        exact = (
            pairs.groupBy("query_id", "doc_id", "q_token_idx")
            .agg(F.max("dp").alias("max_dp"))
            .groupBy("query_id", "doc_id")
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list("max_dp")),
                    F.lit(0.0).cast("double"),
                    lambda acc, v: acc + v,
                ).alias("score")
            )
        )

        # Q10: final top-k (deterministic tie-break)
        return topk(exact, p.top_k)

    def search_brute(self, query_tokens: DataFrame, k: int | None = None) -> DataFrame:
        """Exact search via decompressed corpus — funnel-free oracle path
        over the *quantized* index (isolates funnel loss from codec loss)."""
        dec = decompress(self.index.tokens, self._centroids, self.index.meta.codec)
        return topk(
            maxsim_scores_relational(query_tokens, dec), k or self.params.top_k
        )

"""Hybrid fusion of semantic + keyword result lists — K6/K7/K8 (SURVEY §2.5).

Semantics (next-plaid/src/text_search.rs:1006-1079):
- RRF:   score(d) = α/(C + rank_sem(d)) + (1−α)/(C + rank_kw(d)), C = 60;
  a doc absent from one list simply gets no contribution from it.
- Relative-score (the API default): min-max normalize each list to [0,1]
  (constant-range lists normalize to 1.0), then α·sem + (1−α)·kw with 0 for
  absent docs.

Both are full-outer joins + fixed-order expressions — exactly reproducible
in the SQL oracle (rational arithmetic only for RRF; one division for
relative-score). Defaults: α = 0.75, fusion = relative_score, semantic
fetch_k = 3·top_k (next-plaid-api/src/handlers/search.rs:147-360).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

RRF_C = 60
DEFAULT_ALPHA = 0.75


def _ranked(df: DataFrame, score_col: str) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col(score_col).desc(), F.col("doc_id").asc()
    )
    return df.select(
        "query_id", "doc_id", F.col(score_col).alias("_s"),
        F.row_number().over(w).alias("_r"),
    )


def fuse_rrf(semantic: DataFrame, keyword: DataFrame, *, alpha: float = DEFAULT_ALPHA,
             k: int = 10, score_col: str = "score") -> DataFrame:
    """(query_id, doc_id, score)×2 → fused (query_id, doc_id, score, rank)."""
    sem = _ranked(semantic, score_col).select(
        "query_id", "doc_id", F.col("_r").alias("sem_rank")
    )
    kw = _ranked(keyword, score_col).select(
        "query_id", "doc_id", F.col("_r").alias("kw_rank")
    )
    fused = sem.join(kw, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.coalesce(F.lit(alpha) / (F.lit(float(RRF_C)) + F.col("sem_rank")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0 - alpha) / (F.lit(float(RRF_C)) + F.col("kw_rank")), F.lit(0.0)
            )
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return fused.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def hybrid_search(semantic: DataFrame, keyword: DataFrame, *,
                  mode: str = "relative_score", alpha: float = DEFAULT_ALPHA,
                  k: int = 10, score_col: str = "score") -> DataFrame:
    """K8 orchestration with one-sided-failure degradation
    (next-plaid-api/src/handlers/search.rs:345-375): queries present in
    BOTH lists are fused; a query whose keyword side is empty/failed falls
    back to its raw semantic ranking truncated to ``k`` (and vice versa) —
    the batched analog of the reference's Option-match. Queries in neither
    list simply produce no rows.

    All routing is semi/anti joins on the (small, already-ranked) result
    lists — no extra pass over the corpus."""
    fuse = fuse_rrf if mode == "rrf" else fuse_relative_score
    # one row per query — always broadcastable
    sem_q = F.broadcast(semantic.select("query_id").distinct())
    kw_q = F.broadcast(keyword.select("query_id").distinct())

    fused = fuse(
        semantic.join(kw_q, "query_id", "left_semi"),
        keyword.join(sem_q, "query_id", "left_semi"),
        alpha=alpha, k=k, score_col=score_col,
    )

    def _truncated(df: DataFrame) -> DataFrame:
        w = Window.partitionBy("query_id").orderBy(
            F.col(score_col).desc(), F.col("doc_id").asc()
        )
        return (
            df.select("query_id", "doc_id", F.col(score_col).alias("score"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    sem_only = _truncated(semantic.join(kw_q, "query_id", "left_anti"))
    kw_only = _truncated(keyword.join(sem_q, "query_id", "left_anti"))
    return fused.unionByName(sem_only).unionByName(kw_only)


def _minmax_norm(df: DataFrame) -> DataFrame:
    """Per-query min-max to [0,1]; constant lists → 1.0
    (text_search.rs:1042-1057)."""
    rng = df.groupBy("query_id").agg(
        F.min("_s").alias("_lo"), F.max("_s").alias("_hi")
    )
    return df.join(rng, "query_id").select(
        "query_id",
        "doc_id",
        F.when(F.col("_hi") == F.col("_lo"), F.lit(1.0))
        .otherwise((F.col("_s") - F.col("_lo")) / (F.col("_hi") - F.col("_lo")))
        .alias("_norm"),
    )


def fuse_relative_score(semantic: DataFrame, keyword: DataFrame, *,
                        alpha: float = DEFAULT_ALPHA, k: int = 10,
                        score_col: str = "score") -> DataFrame:
    sem = _minmax_norm(_ranked(semantic, score_col)).withColumnRenamed("_norm", "sem_n")
    kw = _minmax_norm(_ranked(keyword, score_col)).withColumnRenamed("_norm", "kw_n")
    fused = sem.join(kw, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        (
            F.lit(alpha) * F.coalesce(F.col("sem_n"), F.lit(0.0))
            + F.lit(1.0 - alpha) * F.coalesce(F.col("kw_n"), F.lit(0.0))
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return fused.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)

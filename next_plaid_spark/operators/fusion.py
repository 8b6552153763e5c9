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
    # Single-plan formulation: one full-outer join (the same join the plain
    # fusions do), with per-query presence flags as windows over the joined
    # frame. Routing via semi/anti joins would evaluate each input list
    # three times (they are usually unmaterialized search plans — the
    # semantic side alone can be a full MaxSim pass); here each side is
    # evaluated exactly as often as in plain fusion. For queries on both
    # sides the score expression is literally the fuse_* formula on the
    # same inputs — bit-identical results.
    if mode == "rrf":
        sem = _ranked(semantic, score_col).select(
            "query_id", "doc_id", F.col("_s").alias("_ss"), F.col("_r").alias("_sr")
        )
        kw = _ranked(keyword, score_col).select(
            "query_id", "doc_id", F.col("_s").alias("_ks"), F.col("_r").alias("_kr")
        )
        joined = sem.join(kw, ["query_id", "doc_id"], "full_outer")
        fused_score = (
            F.coalesce(F.lit(alpha) / (F.lit(float(RRF_C)) + F.col("_sr")), F.lit(0.0))
            + F.coalesce(
                F.lit(1.0 - alpha) / (F.lit(float(RRF_C)) + F.col("_kr")), F.lit(0.0)
            )
        )
        sem_raw, kw_raw = F.col("_ss"), F.col("_ks")
        sem_present, kw_present = F.col("_sr"), F.col("_kr")
    else:
        sem = _minmax_norm(_ranked(semantic, score_col), keep_raw=True).select(
            "query_id", "doc_id", F.col("_norm").alias("sem_n"),
            F.col("_s").alias("_ss"),
        )
        kw = _minmax_norm(_ranked(keyword, score_col), keep_raw=True).select(
            "query_id", "doc_id", F.col("_norm").alias("kw_n"),
            F.col("_s").alias("_ks"),
        )
        joined = sem.join(kw, ["query_id", "doc_id"], "full_outer")
        fused_score = (
            F.lit(alpha) * F.coalesce(F.col("sem_n"), F.lit(0.0))
            + F.lit(1.0 - alpha) * F.coalesce(F.col("kw_n"), F.lit(0.0))
        )
        sem_raw, kw_raw = F.col("_ss"), F.col("_ks")
        sem_present, kw_present = F.col("sem_n"), F.col("kw_n")

    wq = Window.partitionBy("query_id")
    has_sem = F.max(sem_present.isNotNull().cast("int")).over(wq) == 1
    has_kw = F.max(kw_present.isNotNull().cast("int")).over(wq) == 1
    scored = joined.select(
        "query_id",
        "doc_id",
        F.when(has_sem & has_kw, fused_score)
        .when(has_sem, sem_raw)
        .otherwise(kw_raw)
        .alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _minmax_norm(df: DataFrame, *, keep_raw: bool = False) -> DataFrame:
    """Per-query min-max to [0,1]; constant lists → 1.0
    (text_search.rs:1042-1057).

    Window aggregates, NOT groupBy+join-back: the join-back diamond puts
    the input subtree in BOTH branches, so an unmaterialized search plan
    feeding a fusion (the funnel semantic leg, the BM25 join tree) would
    be evaluated twice per fused list. The windows keep the plan linear —
    one pass — and ride the query_id exchange ``_ranked`` already
    introduced, so they add no shuffle."""
    wq = Window.partitionBy("query_id")
    lo, hi = F.min("_s").over(wq), F.max("_s").over(wq)
    cols = ["query_id", "doc_id"] + (["_s"] if keep_raw else [])
    return df.select(
        *cols,
        F.when(hi == lo, F.lit(1.0))
        .otherwise((F.col("_s") - lo) / (hi - lo))
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

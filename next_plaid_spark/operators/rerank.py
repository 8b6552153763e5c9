"""Standalone rerank + embedding reconstruction — Q12/Q13/B11.

Rerank (next-plaid-api/src/handlers/rerank.rs:57-198): given queries and an
explicit candidate list (no index), score with plain MaxSim, sort desc with
stable tie-break, reject/rank-last non-finite scores (search.rs:92-133
``total_cmp`` discipline → here an explicit finite-last sort key).

Reconstruction (next-plaid/src/embeddings.rs:56-116): codes + residuals →
approximate original embeddings for a doc list — ``decompress`` over a
semi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from next_plaid_spark.operators.codec import decompress
from next_plaid_spark.operators.maxsim import (
    maxsim_scores_by_token,
    maxsim_scores_relational,
)
from next_plaid_spark.sources.index_store import PlaidIndex


def rerank(query_tokens: DataFrame, doc_tokens: DataFrame,
           pairs: DataFrame | None = None, *, top_k: int | None = None) -> DataFrame:
    """(query_id, doc_id, score, rank); non-finite scores rank last (Q13).

    ``pairs(query_id, doc_id)`` restricts scoring to given candidates —
    the API's rerank contract (explicit doc list per query); omitted =
    all-pairs.
    """
    if pairs is not None:
        doc_tokens = doc_tokens.join(
            pairs.select("doc_id").distinct(), "doc_id", "left_semi"
        )
    if "token" in query_tokens.columns and "token" in doc_tokens.columns:
        scored = maxsim_scores_by_token(query_tokens, doc_tokens)
    else:
        scored = maxsim_scores_relational(query_tokens, doc_tokens)
    if pairs is not None:
        scored = scored.join(pairs, ["query_id", "doc_id"], "left_semi")
    finite = (~F.isnan("score")) & (F.col("score") > float("-inf")) & (
        F.col("score") < float("inf")
    )
    w = Window.partitionBy("query_id").orderBy(
        finite.desc(),            # finite first (non-finite rank last)
        F.col("score").desc(),
        F.col("doc_id").asc(),
    )
    out = scored.withColumn("rank", F.row_number().over(w))
    if top_k is not None:
        out = out.filter(F.col("rank") <= top_k)
    return out


def reconstruct_embeddings(index: PlaidIndex, doc_ids: DataFrame | list[int]) -> DataFrame:
    """B11: (doc_id, token_idx, vec) for the requested docs, decompressed
    from codes + residuals."""
    toks = index.tokens
    if isinstance(doc_ids, DataFrame):
        toks = toks.join(
            doc_ids.select(F.col("doc_id").cast("long")), "doc_id", "left_semi"
        )
    else:
        toks = toks.filter(F.col("doc_id").isin([int(i) for i in doc_ids]))
    return decompress(toks, index.centroids_np(), index.meta.codec).select(
        "doc_id", "token_idx", "vec"
    )

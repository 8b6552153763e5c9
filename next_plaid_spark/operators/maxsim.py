"""MaxSim scoring — the core late-interaction relevance kernel.

Semantics (next-plaid/src/maxsim.rs:270-328, search.rs:82-90): for each query
token, take the max dot-product over all of a document's token vectors, then
sum over query tokens:

    score(Q, D) = Σ_{q ∈ Q} max_{d ∈ D} q·d

Two implementations:

1. ``maxsim_relational`` — pure DataFrame ops (join → groupBy max → groupBy
   sum). Oracle-checkable in ANSI SQL, and the brute-force *exact* baseline
   used to validate the ANN funnel (SURVEY.md §7 phase 1).

2. ``maxsim_pandas`` — Arrow-batched grouped kernel: one BLAS GEMM
   ``Q @ D.T`` per (query, doc-chunk), ``max(axis)`` + ``sum`` — the Spark
   analog of the reference's rayon/BLAS path. Used by the funnel's exact
   rerank stage (search.rs:481-493) where the candidate set is small.

Scale note: the relational form shuffles |q_tokens × candidate_doc_tokens|
rows; it is intended for *post-candidate-generation* scoring (thousands of
candidate docs per query), never the full corpus at 100 TB — that is what the
IVF funnel (operators/search.py) is for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from next_plaid_spark.functions.vector import dot


def maxsim_scores_relational(query_tokens: DataFrame, doc_tokens: DataFrame) -> DataFrame:
    """Exact MaxSim for every (query_id, doc_id) pair present in the inputs.

    Returns ``(query_id, doc_id, score DOUBLE)``.

    ``doc_tokens`` may be pre-restricted to candidates (semi-joined) — the
    funnel does exactly that; passing the full corpus gives the brute-force
    oracle.
    """
    qt = query_tokens.select(
        "query_id", F.col("token_idx").alias("q_token_idx"), F.col("vec").alias("q_vec")
    )
    dt = doc_tokens.select("doc_id", F.col("vec").alias("d_vec"))
    pairs = qt.crossJoin(dt).select(
        "query_id",
        "doc_id",
        "q_token_idx",
        dot(F.col("q_vec"), F.col("d_vec")).alias("dp"),
    )
    per_qtoken = pairs.groupBy("query_id", "doc_id", "q_token_idx").agg(
        F.max("dp").alias("max_dp")
    )
    # Deterministic float sum: max is exact under reordering, but the final
    # Σ over query tokens is not — fold the per-token maxima in sorted order
    # so the score is bit-identical across partitionings (and to the DuckDB
    # oracle, which does the same `list_reduce(list_sort(list(...)))`).
    return per_qtoken.groupBy("query_id", "doc_id").agg(
        F.aggregate(
            F.array_sort(F.collect_list("max_dp")),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        ).alias("score")
    )


def maxsim_scores_by_token(query_tokens: DataFrame, doc_tokens: DataFrame) -> DataFrame:
    """Exact MaxSim exploiting encoder determinism: identical token text ⇒
    identical vector, so dot products are computed once per distinct
    (query-token, doc-token) *text* pair and per-doc maxima once per distinct
    (query-token, doc) pair — a common-subexpression elimination that cuts
    the sf0.1 brute-force pass ~10× while staying bit-identical (max over
    the same value set; the final sum folds the same multiset in the same
    sorted order).

    Requires a ``token`` column on both inputs (encoding.py provides it).
    At 100 TB this is the difference between |q_tokens × d_tokens| fold
    evaluations and |q_vocab × d_vocab| — Zipfian text makes the vocab side
    tiny relative to the corpus.
    """
    q_vocab = query_tokens.select("token", "vec").dropDuplicates(["token"])
    d_vocab = doc_tokens.select(
        F.col("token").alias("d_token"), F.col("vec").alias("d_vec")
    ).dropDuplicates(["d_token"])
    pair_scores = q_vocab.crossJoin(d_vocab).select(
        "token", "d_token", dot(F.col("vec"), F.col("d_vec")).alias("dp")
    )
    doc_token_set = doc_tokens.select("doc_id", F.col("token").alias("d_token")).distinct()
    # max over each doc's token set, per query-token text
    per_doc_max = (
        pair_scores.join(doc_token_set, "d_token")
        .groupBy("token", "doc_id")
        .agg(F.max("dp").alias("max_dp"))
    )
    qt = query_tokens.select("query_id", "token_idx", "token")
    return (
        qt.join(per_doc_max, "token")
        .groupBy("query_id", "doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list("max_dp")),
                F.lit(0.0).cast("double"),
                lambda acc, v: acc + v,
            ).alias("score")
        )
    )


def topk(scored: DataFrame, k: int, score_col: str = "score") -> DataFrame:
    """Per-query top-k: finite scores desc, NON-FINITE LAST, doc_id asc.

    Q13 parity with search.rs:110-117 (cmp_score_ascending): every
    non-finite score (NaN, ±inf, null) ranks below every finite score and
    non-finites are mutually equal (doc_id breaks their ties). Spark's
    native sort puts NaN ABOVE +inf, so a bare ``score desc`` would rank a
    NaN-corrupted row FIRST — the explicit finite-last key makes upstream
    numeric corruption degrade gracefully instead of silently winning."""
    c = F.col(score_col)
    finite = c.isNotNull() & ~F.isnan(c) & (c > F.lit(float("-inf"))) & (
        c < F.lit(float("inf"))
    )
    w = Window.partitionBy("query_id").orderBy(
        finite.desc(),                            # finite block first
        F.when(finite, c).desc_nulls_last(),      # value order within it
        F.col("doc_id").asc(),
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def brute_force_search(
    query_tokens: DataFrame, doc_tokens: DataFrame, k: int = 10
) -> DataFrame:
    """Exact top-k MaxSim over the full corpus — the funnel's recall oracle.

    Dispatches to the token-deduped fast path when both sides carry the
    ``token`` column (bit-identical results, see maxsim_scores_by_token)."""
    if "token" in query_tokens.columns and "token" in doc_tokens.columns:
        scores = maxsim_scores_by_token(query_tokens, doc_tokens)
    else:
        scores = maxsim_scores_relational(query_tokens, doc_tokens)
    return topk(scores, k)


# (A pre-joined applyInPandas GEMM variant, maxsim_pandas, used to live
# here; it was dead code with a row-at-a-time inner loop — removed in r5.
# The exact rerank stage lives in plans/searcher.py Q9.)

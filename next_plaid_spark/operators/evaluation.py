"""IR quality evaluation — the reference's quality gate as DataFrame aggs.

The reference evaluates retrieval quality with ranx (MAP / NDCG@k /
Recall@k) over BEIR datasets (``docs/benchmarks/benchmark_scifact_docker.py:1-60``,
Makefile ``compare-scifact`` / ``benchmark-fastplaid-compat`` targets) and
reports NDCG@10 / Recall@100 per dataset in its README (README.md:260-267).
This module is that evaluation surface as a *distributed* operator: results
and qrels are DataFrames, metrics are one grouped aggregation per query —
at 100 TB / millions of queries the evaluation itself is a Spark job, not a
driver-side ranx call.

Metric definitions (trec_eval / ranx conventions, except NDCG's gain —
see below):

- ``ndcg_at_k``  — exponential-gain DCG ``Σ (2^rel − 1)/log2(rank+1)`` over
  ranked hits at rank ≤ k, normalized by the ideal DCG of the top-k
  relevance grades (ties in the ideal ordering broken by doc_id asc so the
  ideal list is deterministic). NOTE: this is the Burges/MS-MARCO
  exponential-gain variant (ranx's ``ndcg_burges``); ranx's default
  ``ndcg`` and trec_eval use linear Järvelin gain (``rel/log2(rank+1)``).
  With binary judgments the two coincide (2^1−1 = 1); with graded
  judgments (e.g. rel=2) this module's NDCG reads higher than a
  ranx-default gate would report on the same run.
- ``recall_at_k``    — |relevant ∩ top-k| / |relevant|.
- ``precision_at_k`` — |relevant ∩ top-k| / k.
- ``ap_at_k``        — Σ_{hits h} P@rank(h) / |relevant|  (trec_eval's MAP
  component: denominator is ALL relevant, not min(R, k)).
- ``rr_at_k``        — 1/rank of the first hit, 0 if none in the top-k.

Determinism: every float sum folds its contribution list in sorted order
(the repo-wide cross-engine discipline, see ``textstats.unigram_logprob``),
and metrics are rounded to 10 decimals because libm log2 may differ from
DuckDB's in the last ulp. Queries with no relevant docs score 0 across the
board (ranx drops them; we keep the row so the output covers every query).

Scale shape: one join results⋈qrels on (query_id, doc_id) — both sides
shuffle-partition by query; one window cumsum; two grouped aggs. No
driver-side state, no collect: evaluating 10M queries is the same plan as
evaluating 10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROUND_DECIMALS = 10


def _sorted_fold(col):
    """Deterministic float sum: fold the collected values in sorted order."""
    return F.aggregate(
        F.array_sort(F.collect_list(col)), F.lit(0.0), lambda a, x: a + x
    )


def ir_metrics(results: DataFrame, qrels: DataFrame, *, k: int = 10) -> DataFrame:
    """Per-query IR metrics over a ranked ``results(query_id, doc_id, rank)``
    DataFrame against graded ``qrels(query_id, doc_id, rel)`` judgments.

    ``rank`` must be 1-based and unique per query (every search operator in
    this package emits exactly that). Rows with ``rel <= 0`` are treated as
    explicit non-relevance, per trec_eval.
    """
    res = results.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("rank").cast("int").alias("rank"),
    ).filter(F.col("rank") <= k)
    rel = qrels.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("rel").cast("int").alias("rel"),
    ).filter(F.col("rel") > 0)

    # ideal DCG@k + total-relevant count, from qrels alone
    w_ideal = Window.partitionBy("query_id").orderBy(
        F.desc("rel"), F.asc("doc_id")
    )
    ideal = (
        rel.withColumn("irank", F.row_number().over(w_ideal))
        .groupBy("query_id")
        .agg(
            F.count("*").alias("n_rel"),
            _sorted_fold(
                F.when(
                    F.col("irank") <= k,
                    (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                    / F.log2(F.col("irank") + 1.0),
                )
            ).alias("idcg"),
        )
    )

    hits = (
        res.join(rel, ["query_id", "doc_id"], "left")
        .withColumn("rel", F.coalesce(F.col("rel"), F.lit(0)))
        .withColumn("hit", (F.col("rel") > 0).cast("int"))
    )
    w_rank = Window.partitionBy("query_id").orderBy("rank")
    hits = hits.withColumn("cum_hits", F.sum("hit").over(w_rank))
    per_q = hits.groupBy("query_id").agg(
        _sorted_fold(
            F.when(
                F.col("hit") == 1,
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                / F.log2(F.col("rank") + 1.0),
            )
        ).alias("dcg"),
        _sorted_fold(
            F.when(
                F.col("hit") == 1,
                F.col("cum_hits").cast("double") / F.col("rank"),
            )
        ).alias("ap_num"),
        F.sum("hit").alias("n_hits"),
        F.min(F.when(F.col("hit") == 1, F.col("rank"))).alias("first_hit"),
    )

    def _r(c):
        return F.round(c, ROUND_DECIMALS)

    # per_q already carries one row for EVERY query present in results
    # (ranks are 1-based, so any query with >=1 result survives the
    # rank<=k cut, and groupBy drops no groups) — joining back onto a
    # results.distinct() branch would evaluate the results subtree (often
    # a full retrieval funnel) a second time for nothing
    return (
        per_q.join(ideal, "query_id", "left")
        .select(
            "query_id",
            _r(
                F.when(
                    F.col("idcg") > 0, F.col("dcg") / F.col("idcg")
                ).otherwise(0.0)
            ).alias("ndcg_at_k"),
            _r(
                F.coalesce(F.col("n_hits") / F.col("n_rel"), F.lit(0.0))
            ).alias("recall_at_k"),
            _r(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.lit(float(k))
            ).alias("precision_at_k"),
            _r(
                F.coalesce(F.col("ap_num") / F.col("n_rel"), F.lit(0.0))
            ).alias("ap_at_k"),
            _r(
                F.coalesce(1.0 / F.col("first_hit"), F.lit(0.0))
            ).alias("rr_at_k"),
        )
    )


def ir_summary(metrics: DataFrame) -> DataFrame:
    """Macro-averaged (mean over queries) summary — the BEIR-style headline
    row: NDCG@k / MAP / Recall@k / P@k / MRR. Means fold in sorted order so
    the summary is deterministic too."""
    return metrics.agg(
        F.count("*").alias("n_queries"),
        *[
            F.round(_sorted_fold(F.col(c)) / F.count("*"), ROUND_DECIMALS).alias(
                c.replace("_at_k", "")
            )
            for c in (
                "ndcg_at_k",
                "ap_at_k",
                "recall_at_k",
                "precision_at_k",
                "rr_at_k",
            )
        ],
    )


def ir_metrics_oracle_sql(results_sql: str, qrels_sql: str, *, k: int = 10) -> str:
    """DuckDB SQL computing the identical per-query metrics, given SQL text
    for the results and qrels relations (each a full SELECT; nested WITH is
    fine — DuckDB allows CTEs inside CTE bodies)."""
    return f"""
WITH results_all AS ({results_sql}),
results AS (SELECT query_id, doc_id, rank FROM results_all WHERE rank <= {k}),
qrels AS (SELECT query_id, doc_id, rel FROM ({qrels_sql}) WHERE rel > 0),
ideal AS (
  SELECT query_id, count(*) AS n_rel,
         coalesce(list_reduce(list_prepend(0.0, list_sort(
           list((pow(2.0, rel) - 1.0) / log2(irank + 1.0))
             FILTER (WHERE irank <= {k}))),
           (a, b) -> a + b), 0.0) AS idcg
  FROM (
    SELECT query_id, rel,
           row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id ASC) AS irank
    FROM qrels
  ) GROUP BY 1
),
hits AS (
  SELECT r.query_id, r.rank, coalesce(q.rel, 0) AS rel,
         CASE WHEN coalesce(q.rel, 0) > 0 THEN 1 ELSE 0 END AS hit,
         sum(CASE WHEN coalesce(q.rel, 0) > 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY r.query_id ORDER BY r.rank) AS cum_hits
  FROM results r LEFT JOIN qrels q USING (query_id, doc_id)
),
per_q AS (
  SELECT query_id,
         coalesce(list_reduce(list_prepend(0.0, list_sort(
           list((pow(2.0, rel) - 1.0) / log2(rank + 1.0))
             FILTER (WHERE hit = 1))),
           (a, b) -> a + b), 0.0) AS dcg,
         coalesce(list_reduce(list_prepend(0.0, list_sort(
           list(cum_hits * 1.0 / rank) FILTER (WHERE hit = 1))),
           (a, b) -> a + b), 0.0) AS ap_num,
         sum(hit) AS n_hits,
         min(CASE WHEN hit = 1 THEN rank END) AS first_hit
  FROM hits GROUP BY 1
)
SELECT qq.query_id,
       round(CASE WHEN i.idcg > 0 THEN p.dcg / i.idcg ELSE 0.0 END, {ROUND_DECIMALS}) AS ndcg_at_k,
       round(coalesce(p.n_hits * 1.0 / i.n_rel, 0.0), {ROUND_DECIMALS}) AS recall_at_k,
       round(coalesce(p.n_hits, 0) * 1.0 / {k}, {ROUND_DECIMALS}) AS precision_at_k,
       round(coalesce(p.ap_num / i.n_rel, 0.0), {ROUND_DECIMALS}) AS ap_at_k,
       round(coalesce(1.0 / p.first_hit, 0.0), {ROUND_DECIMALS}) AS rr_at_k
FROM (SELECT DISTINCT query_id FROM results_all) qq
LEFT JOIN per_q p USING (query_id)
LEFT JOIN ideal i USING (query_id)
""".strip()

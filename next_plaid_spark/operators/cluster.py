"""Duplicate-cluster formation — connected components over near-dup pairs.

The reference's dedup surface stops at pair lists (next-plaid has no
grouping step); a training-data pipeline needs the next one: group
transitively-linked duplicates and keep ONE canonical document per
cluster. Pair lists alone under-delete (A~B, B~C ⇒ drop B and C, keep A —
but the pair list never relates A and C).

``connected_components`` is the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and
Beyond", SoCC'14): each round is two groupBy/join passes over the edge
list — no driver-side graph, no vertex-indexed state — converging in
O(log² n) rounds (2-3 rounds in practice for dedup graphs, which are
near-cliques). This is the standard shuffle-bounded CC for edge lists
that don't fit one machine, so the operator keeps its shape at 100 TB:
every pass shuffles at most |E| rows keyed by node id.

Iterative DataFrame plans grow lineage linearly, so each round is cut
with ``localCheckpoint`` (on a real cluster with executor churn, set a
checkpoint dir and swap in ``checkpoint``) — without it Catalyst re-plans
the whole history every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _edge_signature(e: DataFrame) -> tuple:
    """Order-independent digest of an edge set: (count, XOR xxhash64(u,v)).
    XOR instead of SUM: overflow-free under ANSI mode, and the edge set is
    distinct so pairwise cancellation can't occur."""
    row = e.agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(u, v))").alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def connected_components(pairs: DataFrame, *, id_a: str = "doc_a",
                         id_b: str = "doc_b", max_iter: int = 25) -> DataFrame:
    """pairs(id_a, id_b) → (node, rep): every node of the pair graph mapped
    to its component representative (the component's smallest id). Nodes
    that appear in no pair are absent (callers coalesce to self).

    Fixpoint detection is an order-independent edge-set digest (count +
    hash sum) — one tiny extra action per round, not a full subtract."""
    e = (
        pairs.select(
            F.col(id_a).cast("long").alias("u"),
            F.col(id_b).cast("long").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    sig = _edge_signature(e)
    for _ in range(max_iter):
        # Per-neighborhood minima ride a u-window on the edge stream (the
        # running first() over v-ascending order IS the min) instead of a
        # groupBy+join-back diamond: one exchange+sort per star step
        # rather than an aggregate exchange plus a join exchange, and the
        # edge set is never produced twice.
        # -- large-star: every neighbor strictly larger than u connects to
        # min(N(u) ∪ {u}) (paper Alg. 2; symmetrized neighborhoods)
        w_u = Window.partitionBy("u").orderBy("v")
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        large = (
            sym.withColumn("m", F.least(F.first("v").over(w_u), F.col("u")))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # -- small-star: key every edge by its LARGER endpoint; all smaller
        # neighbors (and u itself) connect to the minimum (paper Alg. 3).
        # Every row emits exactly ONE edge — the row_number()==1 row (where
        # v IS the minimum) becomes the (u, m) self-edge the groupBy
        # formulation emitted via a mins-table union, and every later row
        # (v > m, strict: edges are distinct so the min is unique) becomes
        # (v, m) — so the whole step is a single conditional projection,
        # not a two-branch union that would evaluate the windowed edge set
        # twice.
        d = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).withColumn("m", F.first("v").over(w_u)).withColumn(
            "_rn", F.row_number().over(w_u)
        )
        small = (
            d.select(
                F.when(F.col("_rn") == 1, F.col("u"))
                .otherwise(F.col("v")).alias("u"),
                F.col("m").alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        new_sig = _edge_signature(small)
        e = small
        if new_sig == sig:
            break
        sig = new_sig
    return e.select(F.col("u").alias("node"), F.col("v").alias("rep"))


def dedup_keep_canonical(docs: DataFrame, pairs: DataFrame, *,
                         id_col: str = "doc_id") -> DataFrame:
    """(doc_id, cluster_rep, kept): each document labeled with its
    duplicate-cluster representative (smallest doc_id in the transitive
    closure of the pair graph; itself when unpaired). ``kept`` marks the
    one survivor per cluster — the downstream curation filter is
    ``WHERE kept``."""
    cc = connected_components(pairs)
    ids = docs.select(F.col(id_col).cast("long").alias("doc_id"))
    out = (
        ids.join(cc, ids["doc_id"] == cc["node"], "left")
        .select(
            "doc_id",
            F.coalesce("rep", F.col("doc_id")).alias("cluster_rep"),
        )
        .withColumn("kept", F.col("cluster_rep") == F.col("doc_id"))
    )
    return out


def sql_dedup_clusters(pairs_sql: str) -> str:
    """DuckDB oracle: transitive closure by recursive CTE over the SAME
    pair list (fine at oracle scale; the Spark side exists because this
    blows up at corpus scale), then min-id per component."""
    return f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({pairs_sql}) mp
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
),
rep AS (
  SELECT u AS doc_id, min(v) AS mn FROM reach GROUP BY u
)
SELECT d.doc_id,
       least(coalesce(r.mn, d.doc_id), d.doc_id) AS cluster_rep,
       least(coalesce(r.mn, d.doc_id), d.doc_id) = d.doc_id AS kept
FROM documents d LEFT JOIN rep r USING (doc_id)
""".strip()


SPLIT_DENOM = 1_000_000


def leakage_free_split(docs: DataFrame, pairs: DataFrame,
                       splits: "list[tuple[str, float]]", *,
                       id_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """(doc_id, cluster_rep, split): train/val/test assignment with
    DUPLICATE-CLUSTER granularity — the split coin hashes the component
    representative, not the document, so every near-duplicate (transitively)
    lands on the same side and eval never sees a paraphrase of train
    (the leakage mode decontamination alone can't fix: dup pairs WITHIN the
    corpus straddling the split boundary).

    ``splits`` is an ordered list of (name, rate) summing to ~1; assignment
    is by cumulative cutoffs over hash60(seed ‖ ':' ‖ rep) mod 1e6 — the
    same deterministic, growth-stable content-hash coin as
    ``corpus.stratified_sample``, so reruns and incremental corpus versions
    agree wherever clusters are unchanged.

    Scale shape: connected components (shuffle-bounded alternating stars)
    + one broadcast-free hash expression; no extra shuffle beyond CC."""
    if not splits or abs(sum(r for _, r in splits) - 1.0) > 1e-9:
        raise ValueError("split rates must sum to 1")
    labeled = dedup_keep_canonical(docs, pairs, id_col=id_col)
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(str(seed)),
                                  F.col("cluster_rep").cast("string"))),
                1, 15,
            ), 16, 10,
        ).cast("long") % SPLIT_DENOM
    )
    expr = None
    cum = 0.0
    for name, rate in splits[:-1]:
        cum += rate
        cond = h < int(round(cum * SPLIT_DENOM))
        branch = F.when(cond, F.lit(name))
        expr = branch if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(splits[-1][0])
    split_col = last if expr is None else expr.otherwise(last)
    return labeled.select("doc_id", "cluster_rep", split_col.alias("split"))


def sql_leakage_free_split(pairs_sql: str,
                           splits: "list[tuple[str, float]]", *,
                           seed: int = 42) -> str:
    """DuckDB mirror: recursive-CTE closure + the identical hash cutoffs."""
    cases, cum = [], 0.0
    for name, rate in splits[:-1]:
        cum += rate
        cases.append(
            f"WHEN h < {int(round(cum * SPLIT_DENOM))} THEN '{name}'"
        )
    case_sql = ("CASE " + " ".join(cases) + f" ELSE '{splits[-1][0]}' END"
                if cases else f"'{splits[-1][0]}'")
    return f"""
WITH clustered AS (
{sql_dedup_clusters(pairs_sql)}
),
hashed AS (
  SELECT doc_id, cluster_rep,
         CAST(concat('0x', substr(md5(concat('{seed}', ':', CAST(cluster_rep AS VARCHAR))), 1, 15)) AS BIGINT) % {SPLIT_DENOM} AS h
  FROM clustered
)
SELECT doc_id, cluster_rep, {case_sql} AS split FROM hashed
""".strip()

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

import os
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from next_plaid_spark.functions.vector import dot
from next_plaid_spark.operators.codec import decompress
from next_plaid_spark.operators.maxsim import maxsim_scores_relational, topk
from next_plaid_spark.sources.index_store import PlaidIndex
from next_plaid_spark.session import local_df


def _seq_centroid_scores(q64: np.ndarray, c64: np.ndarray,
                         threads: int = 1) -> np.ndarray:
    """[rows, K] query·centroid scores in float64, accumulated sequentially
    over dim (0.0 + q₀c₀ + q₁c₁ + …) — the exact fold order of
    functions/vector.py::dot and of the DuckDB oracle's
    ``list_reduce(list_transform(...), (a,b) -> a+b)``, so the probe, t_cs
    prune, and codes-only approx scores are bit-reproducible cross-engine
    (the reference's f32 GEMM at search.rs:388-409 is NOT reproduced: the
    funnel's contract is its own determinism, not the reference's bit
    pattern). Row-blocked; with ``threads`` > 1 disjoint row blocks run on
    a thread pool (numpy releases the GIL) — same per-element fold order,
    bit-identical output."""
    rows, dim = q64.shape
    k = c64.shape[0]
    if rows == 0:
        return np.zeros((0, k), dtype=np.float64)
    qt = np.ascontiguousarray(np.asarray(q64, dtype=np.float64).T)
    ct = np.ascontiguousarray(np.asarray(c64, dtype=np.float64).T)
    out = np.empty((rows, k), dtype=np.float64)
    block = 256

    def work(r0: int) -> None:
        r1 = min(r0 + block, rows)
        blk = out[r0:r1]
        np.multiply(qt[0, r0:r1][:, None], ct[0][None, :], out=blk)
        tmp = np.empty((r1 - r0, k), dtype=np.float64)
        for j in range(1, dim):
            np.multiply(qt[j, r0:r1][:, None], ct[j][None, :], out=tmp)
            blk += tmp

    starts = range(0, rows, block)
    if threads > 1 and rows > block:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(threads) as ex:
            list(ex.map(work, starts))
    else:
        for r0 in starts:
            work(r0)
    return out


def _topn_mask(scores: np.ndarray, n: int) -> np.ndarray:
    """Boolean mask of the top-``n`` columns per row under the total order
    (score desc, column-index asc) — deterministic under ties, unlike a raw
    ``argpartition`` (whose boundary-tie choice is undefined, the one thing
    that kept the approximate funnel un-oracle-able). Vectorized: nth-value
    threshold, strictly-greater always in, boundary ties admitted lowest
    index first via an in-row cumulative count. Matches the oracle's
    ``row_number() OVER (ORDER BY score DESC, code ASC) <= n``."""
    k = scores.shape[1]
    if n >= k:
        return np.ones(scores.shape, dtype=bool)
    thresh = np.partition(scores, k - n, axis=1)[:, k - n][:, None]
    strict = scores > thresh
    need = n - strict.sum(axis=1)
    tie = scores == thresh
    tie_rank = np.cumsum(tie, axis=1)
    return strict | (tie & (tie_rank <= need[:, None]))


def _sorted_fold(col) -> "F.Column":
    """Σ over a group in ascending-value order: collect, sort, sequential
    double fold — the deterministic-order twin of F.sum, bit-identical to
    DuckDB's list_reduce(list_prepend(0.0, list_sort(list(x)))). Used for
    the approximate scores so every Q6 strategy (and the oracle) folds the
    per-token maxima identically."""
    return F.aggregate(
        F.array_sort(F.collect_list(col)),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


@dataclass
class SearchParams:
    """Defaults mirror search.rs:54-69."""
    top_k: int = 10
    n_ivf_probe: int = 8
    n_full_scores: int = 4096
    centroid_score_threshold: float = 0.4
    # subset probe scaling cap (search.rs:370-382)
    max_probe_scale: int = 16
    # extension (off = reference parity): never let t_cs prune a query to
    # zero cells — keep its single best cell. With synthetic low-dim
    # vectors a diffuse cluster can push every probed score below 0.4,
    # which silently empties that query's results.
    keep_best_cell: bool = False


# query-side size budget for the broadcast approx strategy: the precomputed
# [q_tokens, K] float64 centroid-score matrix (built once driver-side, then
# broadcast) must stay comfortably broadcastable. 256 MB holds a
# 500-query × 8-token batch against K=4096 cells; bigger batches fall to
# the chunked strategy, which splits by whole queries and stays
# bit-identical.
BROADCAST_SCORES_BUDGET_BYTES = 256 << 20

# row budget for the Q9 vocab dot tables — the funnel's only nested-loop
# join (|distinct surviving quantized vecs| × |query vocab| rows). Fine at
# defaults; a pathological batch (huge vocab × huge survivor set) falls
# back to the per-query equi-join form, which computes dots only for
# surviving (query, doc) pairs and contains no cartesian product.
RERANK_DOT_BUDGET_ROWS = 64 << 20


class BatchSearcher:
    def __init__(self, index: PlaidIndex, params: SearchParams | None = None,
                 *, approx_strategy: str = "auto",
                 broadcast_budget_bytes: int | None = None):
        """approx_strategy:
        'auto' (default) — 'broadcast' while the query batch's centroid-score
        matrix fits the broadcast budget, else 'chunked'.
        'broadcast' — query side (token matrix + surviving cells) collected
        and broadcast; one doc-parallel kernel scans each candidate doc's
        code list exactly once for the whole batch. The scalable batch mode:
        the query batch is the small side by construction, the corpus never
        re-shuffles per query.
        'chunked' — the over-budget fallback: the query batch is split into
        broadcast-budget-sized chunks of whole queries, each running the
        broadcast kernel; results union. Bounded driver memory at any batch
        size, and each chunk still scans candidate docs once (measured ~1.5×
        the broadcast wall for a same-size batch split 4 ways).
        'kernel' — cogrouped Arrow kernel, the analog of the reference's
        sparse codes-only scoring (search.rs:256-302); fully driver-free
        but materializes the (query × doc) candidate pairs, duplicating
        each candidate doc's code list per query (shipped as INT to halve
        the shuffle). Measured ~2-2.5× the broadcast wall at sf0.1
        batch500 — a worst case for this strategy: at that SF the probe is
        non-selective (~every doc is a candidate of every query, 2.5M
        pairs for 500×5k), so the pair shuffle carries the whole corpus
        per query while broadcast scans each doc once per batch. On a
        selective corpus (real K, candidates ≪ N) the pair volume is
        n_queries × candidates, the strategy's intended regime. Kept for
        truly unbounded batches where even per-chunk driver collection is
        unwanted, and for plan comparison.
        'relational' — pure Catalyst joins; same results, quadratically more
        shuffled rows (kept for plan comparison and environments without
        Python workers)."""
        self.index = index
        self.params = params or SearchParams()
        self.approx_strategy = approx_strategy
        self.broadcast_budget_bytes = (
            BROADCAST_SCORES_BUDGET_BYTES if broadcast_budget_bytes is None
            else broadcast_budget_bytes
        )
        self._centroids = index.centroids_np()
        # float64 copy of the same values (f32 → f64 is exact): every
        # centroid-score fold runs in double from source values
        self._centroids64 = np.ascontiguousarray(self._centroids,
                                                 dtype=np.float64)
        # DataFrames cached by search() calls (query tokens, subset, pruned
        # ivf). They must stay cached while the returned lazy plan is being
        # consumed, so search() can't unpersist them itself; long-lived
        # sessions issuing many filtered searches should call release()
        # between batches to drop them.
        self._live_caches: list[DataFrame] = []

    def release(self) -> None:
        """Unpersist every DataFrame cached by prior search() calls.

        Call after the results of those searches have been fully consumed
        (collected/written); the next search() re-caches what it needs."""
        for df in self._live_caches:
            try:
                df.unpersist()
            except Exception:
                pass
        self._live_caches.clear()

    # -- Q6 strategies ------------------------------------------------------
    def _approx_kernel(self, query_tokens: DataFrame, candidates: DataFrame,
                       doc_codes: DataFrame) -> DataFrame:
        """Codes-only approximate MaxSim as a cogrouped Arrow kernel: per
        query, one [q_tokens, K] GEMM against the broadcast centroids, then
        a vectorized gather+max over each candidate doc's code list. Row
        volume is |candidates| (one row per (query, doc) with a small int
        array), vs the relational strategy's |candidates × doc_codes ×
        q_tokens| shuffle. ``doc_codes`` is (doc_id, codes ARRAY) — the
        precomputed index artifact (or equivalent aggregation), NOT
        re-derived from the token table per batch."""
        import numpy as np
        import pandas as pd

        c64 = self._centroids64
        # codes are centroid ids (K ≤ 2^18 in any real config): shipping the
        # per-pair code list as INT halves the cogroup shuffle — the
        # strategy's dominant cost — with identical downstream values
        cand_with_codes = candidates.join(
            doc_codes.select("doc_id",
                             F.col("codes").cast("array<int>").alias("codes")),
            "doc_id")

        def score(key, cand_pdf, qt_pdf):
            if not len(cand_pdf) or not len(qt_pdf):
                return pd.DataFrame(
                    {"query_id": [], "doc_id": [], "approx_score": []}
                ).astype({"query_id": "int64", "doc_id": "int64",
                          "approx_score": "float64"})
            q = np.asarray(
                [np.asarray(v, dtype=np.float64)
                 for v in qt_pdf.sort_values("token_idx")["vec"]]
            )
            # [K, q_tokens] (transposed): the per-code gather below pulls
            # whole contiguous rows instead of strided columns — same
            # values, much better cache behavior on the hot gather.
            # float64 sequential fold — bit-identical to the broadcast
            # strategy's driver matrix and the DuckDB oracle.
            scores_t = np.ascontiguousarray(_seq_centroid_scores(q, c64).T)
            # segment-max over the flattened code lists — no per-doc Python
            # loop (maximum.reduceat segments at each doc's offset)
            code_lists = [np.asarray(cs, dtype=np.int64) for cs in cand_pdf["codes"]]
            lens = np.fromiter((len(cs) for cs in code_lists), dtype=np.int64)
            keep_mask = lens > 0
            flat = np.concatenate([cs for cs in code_lists if len(cs)]) if keep_mask.any() else np.array([], dtype=np.int64)
            if not len(flat):
                return pd.DataFrame(
                    {"query_id": [], "doc_id": [], "approx_score": []}
                ).astype({"query_id": "int64", "doc_id": "int64",
                          "approx_score": "float64"})
            offsets = np.zeros(int(keep_mask.sum()), dtype=np.int64)
            np.cumsum(lens[keep_mask][:-1], out=offsets[1:])
            seg_max = np.maximum.reduceat(scores_t[flat], offsets, axis=0)
            # ascending-value sequential fold of the per-token maxima —
            # same fold as _sorted_fold / the broadcast kernel / the oracle
            vals = np.sort(seg_max, axis=1)
            approx = np.zeros(len(vals), dtype=np.float64)
            for t in range(vals.shape[1]):
                approx += vals[:, t]
            return pd.DataFrame(
                {"query_id": key[0],
                 "doc_id": np.asarray(cand_pdf["doc_id"])[keep_mask],
                 "approx_score": approx}
            )

        # rename one side's key: candidates descends from query_tokens, and
        # cogroup on the same attribute trips the ambiguous-self-join check
        qt_side = query_tokens.select(
            F.col("query_id").alias("qid"), "token_idx", "vec"
        )
        return cand_with_codes.groupBy("query_id").cogroup(
            qt_side.groupBy("qid")
        ).applyInPandas(
            score, schema="query_id long, doc_id long, approx_score double"
        )

    def _approx_broadcast(self, query_tokens: DataFrame, n_probe: int,
                          p: "SearchParams", ivf: DataFrame,
                          prune_to: int | None = None,
                          eligible_mask: np.ndarray | None = None,
                          qt_pdf=None, spread: bool = True) -> DataFrame:
        """Q1–Q6 with the query side broadcast.

        Collects the batch's query tokens to the driver (the small side of
        batch search by construction) and precomputes the [q_tokens, K]
        centroid-score matrix ONCE — which makes the probe (Q1/Q2: per-token
        argpartition) and the t_cs prune (Q3) pure driver-side NumPy instead
        of two extra Spark jobs. Candidacy — d ∈ ∪_{c∈cells(q)} ivf[c] — is
        equivalent to codes(d) ∩ cells(q) ≠ ∅ (a doc is in a cell's IVF list
        iff one of its tokens has that code, index.rs:479-508), so Q5 runs as
        a segment-max over a boolean cell mask inside a doc-parallel kernel
        that scans each candidate doc's code list exactly once per batch; the
        exploded (query × doc) pair shuffle of the other strategies
        disappears entirely.

        Bit-determinism (what makes the approximate funnel hash-checkable
        against a DuckDB oracle — see queries.py::sql_plaid_search_topk):
        centroid scores are float64 sequential-over-dim folds from the
        SOURCE vector values (_seq_centroid_scores, computed ONCE driver-side
        and broadcast — the executors consume, never recompute); the probe
        is deterministic under ties (_topn_mask: score desc, code asc); the
        approx score folds each pair's per-token maxima in ascending-value
        order (sorted fold with exact-identity 0.0 padding) — the same fold
        the kernel/relational strategies and the oracle use, so all four
        strategies are bit-identical, not just value-close.
        """
        import pandas as pd

        spark = query_tokens.sparkSession
        c64 = self._centroids64
        k_total = c64.shape[0]

        if qt_pdf is None:
            qt_pdf = (
                query_tokens.select("query_id", "token_idx", "vec")
                .sort("query_id", "token_idx")
                .toPandas()
            )
        empty = pd.DataFrame(
            {"query_id": [], "doc_id": [], "approx_score": []}
        ).astype({"query_id": "int64", "doc_id": "int64", "approx_score": "float64"})
        schema = "query_id long, doc_id long, approx_score double"
        if not len(qt_pdf):
            return spark.createDataFrame(empty, schema=schema)

        # token-dedup (the vectors are a pure function of the token text for
        # a deterministic encoder; np.unique needs no token column): all
        # score-matrix work runs per distinct vector. float64 straight from
        # the source values + padded per-query row-index matrix — the same
        # query-side arrays the Q9 kernel uses.
        from next_plaid_spark.operators.maxsim import query_side_arrays

        qv, qi_mat, qi_ok, qids = query_side_arrays(qt_pdf)
        scores_v = _seq_centroid_scores(
            qv, c64, threads=min(16, os.cpu_count() or 1))  # [V, K] float64
        if eligible_mask is not None:
            # Q4 under filter (search.rs:350-364): the probe pool is
            # restricted to eligible centroids — cells holding subset docs —
            # so no probe slot is wasted on a cell that cannot contribute.
            # Candidate docs are subset docs, and every code of a subset doc
            # is by definition an eligible cell, so the kernel below never
            # gathers a masked column — masking before broadcast is safe.
            scores_v[:, ~eligible_mask] = -np.inf

        # Q2 probe + Q3 prune, driver-side (deterministic under ties:
        # score desc, code asc — the oracle's row_number order)
        n = min(n_probe, k_total)
        if eligible_mask is not None:
            # never let the probe select a masked -inf column even if a
            # caller skips the n_probe ≤ eligible-count cap
            n = max(1, min(n, int(eligible_mask.sum())))
        sel = _topn_mask(scores_v, n)
        cell_mask = np.zeros((len(qids), k_total), dtype=bool)
        for qx in range(len(qids)):
            rows = qi_mat[qx][qi_ok[qx]]
            probed_cells = np.nonzero(sel[rows].any(axis=0))[0]
            cell_best = scores_v[rows][:, probed_cells].max(axis=0)
            keep = cell_best >= p.centroid_score_threshold
            if p.keep_best_cell and not keep.all():
                # rank 1 by (cell_max desc, code asc) — always survives
                best = probed_cells[np.lexsort((probed_cells, -cell_best))[0]]
                keep |= probed_cells == best
            cell_mask[qx, probed_cells[keep]] = True

        # The broadcast carries the driver-built [V, K] float64 score matrix
        # itself (bounded by broadcast_budget_bytes via the auto/chunked
        # split): executors consume the exact driver bits instead of
        # rebuilding per partition, which keeps the sequential-fold scores
        # bit-identical everywhere without paying the (non-BLAS) fold cost
        # once per partition.
        b_S = spark.sparkContext.broadcast(scores_v)
        b_mask = spark.sparkContext.broadcast(cell_mask)
        b_meta = spark.sparkContext.broadcast((qids, qi_mat, qi_ok))

        def kern(batches):
            S = b_S.value  # [V, K] float64, the driver's exact bits
            Cm = b_mask.value
            kqids, kqi, kok = b_meta.value
            n_q = len(kqids)
            t_max = kqi.shape[1]
            # bound the [V, F] gather below ~32 MB per chunk, and the
            # [n_q, t_max, nd] per-token maxima tensor below ~32 MB too
            chunk_flat = max(1024, (32 << 20) // max(1, 8 * S.shape[0]))
            nd_cap = max(64, (32 << 20) // max(1, 8 * n_q * t_max))
            for pdf in batches:
                if not len(pdf):
                    continue
                code_lists = [np.asarray(cs, dtype=np.int64) for cs in pdf["codes"]]
                lens = np.fromiter((len(cs) for cs in code_lists), dtype=np.int64)
                keep = lens > 0
                if not keep.any():
                    continue
                doc_ids = np.asarray(pdf["doc_id"])[keep]
                kept = [cs for cs in code_lists if len(cs)]
                klens = lens[keep]
                # chunk docs so each flat-code gather stays bounded
                start = 0
                while start < len(kept):
                    end = start
                    tot = 0
                    while end < len(kept) and end - start < nd_cap and (
                        tot == 0 or tot + klens[end] <= chunk_flat
                    ):
                        tot += klens[end]
                        end += 1
                    flat = np.concatenate(kept[start:end])
                    offs = np.zeros(end - start, dtype=np.int64)
                    np.cumsum(klens[start:end][:-1], out=offs[1:])
                    seg_max = np.maximum.reduceat(S[:, flat], offs, axis=1)
                    is_cand = np.maximum.reduceat(Cm[:, flat], offs, axis=1)
                    # sort chunk columns by doc_id so a stable argsort on
                    # score alone realizes the (score desc, doc_id asc)
                    # tie-break row-parallel
                    ordc = np.argsort(doc_ids[start:end])
                    d_sorted = doc_ids[start:end][ordc]
                    seg_max = seg_max[:, ordc]
                    is_cand = is_cand[:, ordc]
                    # per-(query, doc) approx score: gather each query's
                    # per-token maxima (pads land on exact-identity 0.0),
                    # sort ascending, fold sequentially — bit-identical to
                    # the relational _sorted_fold and the DuckDB oracle's
                    # list_reduce(list_prepend(0.0, list_sort(list(mx))))
                    T = seg_max[kqi]            # [n_q, t_max, nd]
                    T[~kok] = 0.0
                    T.sort(axis=1)
                    qs = np.zeros((n_q, T.shape[2]), dtype=np.float64)
                    for t in range(t_max):
                        qs += T[:, t, :]
                    if prune_to is not None and qs.shape[1] > prune_to:
                        # two-phase top-k (Q7 pre-prune): the global
                        # top-prune_to per query is contained in every
                        # chunk's local top-prune_to under the same
                        # (score desc, doc_id asc) order, so the rank
                        # window downstream shuffles O(chunks · prune_to)
                        # rows per query instead of the full candidate set
                        masked = np.where(is_cand, qs, -np.inf)
                        sel = np.argsort(-masked, axis=1, kind="stable")[:, :prune_to]
                        m = np.take_along_axis(is_cand, sel, axis=1)
                        if not m.any():
                            start = end
                            continue
                        sc = np.take_along_axis(qs, sel, axis=1)[m]
                        d = d_sorted[sel][m]
                        qout = np.broadcast_to(
                            kqids[:, None], sel.shape
                        )[m]
                    else:
                        qidx, didx = np.nonzero(is_cand)
                        if not len(qidx):
                            start = end
                            continue
                        qout = kqids[qidx]
                        d = d_sorted[didx]
                        sc = qs[qidx, didx]
                    yield pd.DataFrame(
                        {"query_id": qout,
                         "doc_id": d,
                         "approx_score": sc}
                    )
                    start = end

        # Q5's corpus pruning: only docs in some surviving cell can be
        # candidates for anyone — a broadcast semi-join on the (small)
        # union of surviving cell ids; no query_id explode
        cand_cell_codes = sorted(int(x) for x in np.nonzero(cell_mask.any(axis=0))[0])
        codes_df = local_df(
            spark, [(x,) for x in cand_cell_codes], "code long")
        cand_docs = (
            F.broadcast(codes_df).join(ivf, "code")
            .select(F.explode("doc_ids").alias("doc_id"))
            .distinct()
        )
        pre = self.index.doc_codes
        if pre is not None:
            # per-doc code lists are an index artifact (the codes.npy
            # analog): read + semi-join, no per-batch corpus aggregation
            doc_lists = pre.join(cand_docs, "doc_id", "left_semi")
        else:
            doc_lists = (
                self.index.tokens.join(cand_docs, "doc_id", "left_semi")
                .select("doc_id", "code")
                .distinct()
                .groupBy("doc_id")
                .agg(F.collect_list("code").alias("codes"))
            )
        if spread:
            doc_lists = self._spread_small(doc_lists)
        return doc_lists.mapInPandas(kern, schema=schema)

    def _rerank_broadcast(self, survivors: DataFrame, qt_pdf) -> DataFrame:
        """Q9 as ONE doc-parallel kernel over the survivor docs.

        The relational Q9 (vocab-CSE dot table → per-doc-token maxima →
        per-pair fold) is 5 joins + 2 aggregations; at batch-500 those
        stages are ~half the funnel wall even though the data volume is
        tiny. This kernel keeps the exact same Q8/Q9 IO discipline —
        residuals are read ONLY for survivor docs — but computes the dot
        table, per-token maxima, and the sorted sequential fold inside one
        ``mapInPandas`` over ``groupBy(doc_id)``-packed (code, residual)
        lists, with the (small, Q8-budget-bounded) survivor pair list and
        the query vocab broadcast.

        Bit-parity with the relational path (and thus the DuckDB oracle):
        decompression calls the same :func:`decompress_np` the decompress()
        operator uses; dots accumulate 0.0 + Σ x·y sequentially over dim
        (the exact fold order of functions/vector.py::dot after both sides
        cast to double); per-(query,doc) scores sort the per-token maxima
        ascending and fold sequentially (array_sort + aggregate's order),
        with 0.0-padding for ragged token counts — IEEE addition of +0.0
        is an exact identity, so the padded fold is bit-identical to the
        unpadded one.

        The survivor pair list never hits the driver: it rides the plan as
        a per-doc ``collect_list(query_id)`` broadcast-joined onto the
        packed token lists, so the whole funnel stays ONE lazy Catalyst
        plan (approx scan stays codes-only, metadata filters stay pushed —
        plan-audit A1/A2 see the full lineage)."""
        idx = self.index
        surv_by_doc = survivors.groupBy("doc_id").agg(
            F.collect_list("query_id").alias("qids")
        )
        packed = (
            idx.tokens.join(
                F.broadcast(surv_by_doc.select("doc_id")), "doc_id", "left_semi"
            )
            .groupBy("doc_id")
            .agg(F.collect_list(F.struct("code", "residual")).alias("crs"))
            .join(F.broadcast(surv_by_doc), "doc_id")
        )
        return self._rerank_kernel_over(packed, qt_pdf)

    def _rerank_kernel_over(self, packed: DataFrame, qt_pdf) -> DataFrame:
        """The Q9 kernel itself over ``packed(doc_id, crs, qids)`` rows —
        shared by the survivor-driven and all-pairs packings."""
        idx = self.index
        schema = "query_id long, doc_id long, score double"

        # query side, deduped by vector identity (np.unique needs no token
        # column) in float64 straight from the source values — shared with
        # the brute-force kernel (operators/maxsim.py::query_side_arrays)
        from next_plaid_spark.operators.maxsim import query_side_arrays

        qv, qi_mat, qi_ok, qids = query_side_arrays(qt_pdf)

        sc = packed.sparkSession.sparkContext
        b_qv = sc.broadcast(qv)
        b_qi = sc.broadcast((qi_mat, qi_ok, qids))
        b_cent = sc.broadcast(np.ascontiguousarray(self._centroids,
                                                   dtype=np.float32))
        codec = idx.meta.codec

        def kern(batches):
            import pandas as pd

            from next_plaid_spark.operators.codec import decompress_np

            qv64 = b_qv.value  # already float64 (see dot() parity note)
            v_cnt, dim = qv64.shape
            kqi, kok, kqids = b_qi.value
            # bound the [V, F] dot/gather work per chunk like the approx kernel
            chunk_flat = max(1024, (32 << 20) // max(1, v_cnt))
            for pdf in batches:
                if not len(pdf):
                    continue
                doc_ids = pdf["doc_id"].to_numpy()
                crs = pdf["crs"]
                doc_qids = pdf["qids"]
                start = 0
                while start < len(doc_ids):
                    end = start
                    tot = 0
                    while end < len(doc_ids) and (
                        tot == 0 or tot + len(crs.iloc[end]) <= chunk_flat
                    ):
                        tot += len(crs.iloc[end])
                        end += 1
                    # flatten + dedup (code, residual) within the chunk —
                    # the kernel-local form of the relational vocab CSE
                    table: dict = {}
                    uids = []
                    lens = []
                    for di in range(start, end):
                        cl = crs.iloc[di]
                        lens.append(len(cl))
                        for r in cl:
                            k = (r["code"], r["residual"])
                            u = table.get(k)
                            if u is None:
                                u = len(table)
                                table[k] = u
                            uids.append(u)
                    lens = np.asarray(lens, dtype=np.int64)
                    keep = lens > 0
                    if not keep.any():
                        start = end
                        continue
                    u_codes = np.fromiter((k[0] for k in table),
                                          dtype=np.int64, count=len(table))
                    u_res = [k[1] for k in table]
                    uvecs = decompress_np(u_codes, u_res, b_cent.value, codec)
                    # dot table [V, U]: 0.0 + Σ_j x_j·y_j sequentially —
                    # the exact fold of functions/vector.py::dot
                    dots = np.zeros((v_cnt, len(table)), dtype=np.float64)
                    for j in range(dim):
                        dots += qv64[:, j][:, None] * uvecs[:, j][None, :]
                    flat = np.asarray(uids, dtype=np.int64)
                    offs = np.zeros(int(keep.sum()), dtype=np.int64)
                    np.cumsum(lens[keep][:-1], out=offs[1:])
                    # per-doc per-vocab-token maxima [nd, V]
                    m_t = np.maximum.reduceat(
                        dots[:, flat], offs, axis=1
                    ).T.copy()
                    keep_idx = np.nonzero(keep)[0]
                    d_chunk = doc_ids[start:end][keep]
                    # survivor pairs, straight from each doc's qids list
                    qid_lists = [
                        np.asarray(doc_qids.iloc[start + i], dtype=np.int64)
                        for i in keep_idx
                    ]
                    pcnt = np.fromiter((len(x) for x in qid_lists),
                                       dtype=np.int64, count=len(qid_lists))
                    total = int(pcnt.sum())
                    if total == 0:
                        start = end
                        continue
                    p_qi = np.searchsorted(kqids, np.concatenate(qid_lists))
                    p_dcol = np.repeat(np.arange(len(d_chunk)), pcnt)
                    # [P, T] per-token maxima for each (query, doc) pair;
                    # pads → exact-identity 0.0 in the sorted fold
                    vals = m_t[p_dcol[:, None], kqi[p_qi]]
                    vals = np.where(kok[p_qi], vals, 0.0)
                    vals.sort(axis=1)
                    acc = np.zeros(total, dtype=np.float64)
                    for t in range(vals.shape[1]):
                        acc = acc + vals[:, t]
                    yield pd.DataFrame(
                        {"query_id": kqids[p_qi],
                         "doc_id": d_chunk[p_dcol],
                         "score": acc}
                    )
                    start = end

        return self._spread_small(packed).mapInPandas(kern, schema=schema)

    def _rerank_all_pairs(self, qt_pdf, subset: DataFrame | None) -> DataFrame:
        """Q9 for the exact configuration: every indexed doc (∩ subset) is a
        survivor of every query, so the survivor bookkeeping collapses —
        per-doc query lists are ONE literal array (the batch's query ids)
        instead of a cross-join + groupBy + two broadcasts, and the packed
        token lists come straight from the corpus. Values are identical to
        ``_rerank_broadcast`` over the all-pairs survivor set: the kernel
        receives the same (crs, qids) rows."""
        idx = self.index
        all_qids = sorted(int(x) for x in np.unique(qt_pdf["query_id"].to_numpy()))
        toks = idx.tokens
        if subset is not None:
            toks = toks.join(subset, "doc_id", "left_semi")
        packed = (
            toks.groupBy("doc_id")
            .agg(F.collect_list(F.struct("code", "residual")).alias("crs"))
            .withColumn(
                "qids",
                F.array(*[F.lit(q).cast("long") for q in all_qids]),
            )
        )
        return self._rerank_kernel_over(packed, qt_pdf)

    def _spread_small(self, df: DataFrame) -> DataFrame:
        """Round-robin a SMALL kernel input across the cluster's cores.

        Tiny corpora defeat both natural sources of kernel parallelism:
        the parquet reader bin-packs small files into one split, and AQE
        coalesces a sub-advisory-size shuffle down to one partition — so
        the doc-parallel numpy kernels end up serialized on a single
        worker, which at bench scale costs more wall than every exchange
        in the plan combined. The explicit repartition is an exchange of a
        few hundred KB (~free) and is skipped entirely once the index is
        big enough (64 MB of token cells) for scans to carry real
        parallelism — at cluster scale this is a no-op. Per-doc kernel
        outputs are partitioning-independent (doc-local folds, chunk-local
        CSE over identical per-pair inputs), so results are bit-identical
        either way."""
        meta = self.index.meta
        if meta.num_embeddings * 24 >= (64 << 20):
            return df
        sc = df.sparkSession.sparkContext
        return df.repartition(sc.defaultParallelism)

    def _approx_chunked(self, query_tokens: DataFrame, n_probe: int,
                        p: "SearchParams", ivf: DataFrame,
                        prune_to: int | None = None,
                        eligible_mask: np.ndarray | None = None,
                        ntok: int | None = None, qt_pdf=None) -> DataFrame:
        """Broadcast kernel over budget-sized chunks of whole queries.

        Splitting by query id keeps every per-query invariant of
        ``_approx_broadcast`` intact (probe, t_cs prune, candidacy and
        scoring are all per-query); the union is therefore bit-identical
        to a single oversized broadcast. Driver memory is bounded by one
        chunk's score matrix at a time. Chunk ranges come from sorted
        distinct query ids (8 bytes/query driver-side), so the per-chunk
        filter is a range predicate that pushes into the token scan.

        When the caller already collected the batch's raw token pdf (it is
        dim/K times smaller than the score matrix that forced chunking, so
        it usually fits the same budget — search() collects it for the
        rerank anyway), the chunk slices come from that pdf driver-side:
        no per-chunk toPandas jobs (each re-ran the query encode) and no
        distinct-qids job — r14, guide §5 driver round-trips. A sorted-pdf
        range slice is exactly the rows the range filter selects, in the
        same (query_id, token_idx) order, so the union stays bit-identical."""
        import math

        # the caller's strategy resolution already counted the batch's
        # tokens — don't pay a second count job per search (r14)
        if ntok is None:
            ntok = (len(qt_pdf) if qt_pdf is not None
                    else query_tokens.count())
        est = ntok * self.index.meta.k * 8
        n_chunks = max(1, math.ceil(est / self.broadcast_budget_bytes))
        if qt_pdf is not None:
            qids = sorted(np.unique(qt_pdf["query_id"].to_numpy()).tolist())
        else:
            qids = sorted(
                r.query_id
                for r in query_tokens.select("query_id").distinct().collect()
            )
        if not qids:
            return self._approx_broadcast(
                query_tokens, n_probe, p, ivf, prune_to=prune_to,
                eligible_mask=eligible_mask,
            )
        n_chunks = min(n_chunks, len(qids))
        per = math.ceil(len(qids) / n_chunks)
        out = None
        for i in range(0, len(qids), per):
            lo, hi = qids[i], qids[min(i + per, len(qids)) - 1]
            sub = query_tokens.filter(
                (F.col("query_id") >= lo) & (F.col("query_id") <= hi)
            )
            sub_pdf = None
            if qt_pdf is not None:
                q = qt_pdf["query_id"]
                sub_pdf = qt_pdf[(q >= lo) & (q <= hi)].reset_index(drop=True)
            # spread=False: per-chunk kernels are quarter-size, and paying
            # the round-robin exchange once per chunk measured net-NEGATIVE
            # at sf0.1 (chunked4 8.3 s → 11.6 s with it; the union of
            # chunk outputs restores cross-chunk parallelism anyway)
            part = self._approx_broadcast(
                sub, n_probe, p, ivf, prune_to=prune_to,
                eligible_mask=eligible_mask, qt_pdf=sub_pdf, spread=False,
            )
            out = part if out is None else out.unionByName(part)
        return out

    def _approx_relational(self, query_tokens: DataFrame, candidates: DataFrame,
                           doc_codes: DataFrame) -> DataFrame:
        """Pure-Catalyst Q6 (token-deduped when the encoder is
        deterministic); same values as the kernel strategy."""
        idx = self.index
        cand_codes = candidates.join(doc_codes, "doc_id").select(
            "query_id", "doc_id", "code"
        )
        cdf = F.broadcast(idx.centroids_df.withColumnRenamed("vec", "cvec"))
        if "token" in query_tokens.columns:
            qt_toks = query_tokens.select(
                "query_id", F.col("token_idx").alias("q_token_idx"), "token"
            )
            tc_pairs = (
                qt_toks.join(cand_codes.select("query_id", "code").distinct(), "query_id")
                .select("token", "code")
                .distinct()
                .join(cdf, "code")
                .join(
                    F.broadcast(
                        query_tokens.select("token", "vec").dropDuplicates(["token"])
                    ),
                    "token",
                )
                .select("token", "code", dot(F.col("vec"), F.col("cvec")).alias("cscore"))
            )
            return (
                cand_codes.join(qt_toks, "query_id")
                .join(tc_pairs, ["token", "code"])
                .groupBy("query_id", "doc_id", "q_token_idx")
                .agg(F.max("cscore").alias("max_c"))
                .groupBy("query_id", "doc_id")
                .agg(_sorted_fold("max_c").alias("approx_score"))
            )
        needed_scores = (
            cand_codes.select("query_id", "code")
            .distinct()
            .join(cdf, "code")
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
        return (
            cand_codes.join(needed_scores, ["query_id", "code"])
            .groupBy("query_id", "doc_id", "q_token_idx")
            .agg(F.max("cscore").alias("max_c"))
            .groupBy("query_id", "doc_id")
            .agg(_sorted_fold("max_c").alias("approx_score"))
        )

    # -- Q1 + Q2: probe ----------------------------------------------------
    def _probe_cells(self, query_tokens: DataFrame, n_probe: int,
                     p: "SearchParams",
                     eligible_mask: np.ndarray | None = None) -> DataFrame:
        """Q1+Q2+Q3 in ONE grouped kernel: per query, one [tokens, K] GEMM
        against the broadcast centroids; probe = per-token argpartition
        top-``n_probe``; cell_max = max over ALL query tokens
        (search.rs:417-425); t_cs filter + keep-best-cell. Returns the
        surviving ``(query_id, code)`` cells.

        Same float64 sequential-fold scores / deterministic top-n as the
        broadcast strategy's driver-side probe — strategies stay bit-aligned
        — but with zero joins: one shuffle by query_id, versus the old
        probe-then-rescore plan that shuffled |probed cells| × |q_tokens|
        vector rows."""
        import pandas as pd

        c64 = self._centroids64
        emask = None if eligible_mask is None else np.asarray(eligible_mask, bool)
        t_cs = p.centroid_score_threshold
        keep_best = p.keep_best_cell

        def run(key, pdf: "pd.DataFrame") -> "pd.DataFrame":
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
            scores = _seq_centroid_scores(x, c64)  # [tokens, K] float64
            n = min(n_probe, scores.shape[1])
            if emask is not None:
                scores[:, ~emask] = -np.inf
                n = max(1, min(n, int(emask.sum())))
            sel = _topn_mask(scores, n)
            cells = np.nonzero(sel.any(axis=0))[0]
            cmax = scores[:, cells].max(axis=0)
            keep = cmax >= t_cs
            if keep_best and len(cells):
                # argmax takes the FIRST max → lowest code on ties, matching
                # the old window's (cell_max desc, code asc) ordering
                keep[int(np.argmax(cmax))] = True
            return pd.DataFrame({
                "query_id": np.int64(key[0]),
                "code": cells[keep].astype(np.int64),
            })

        return (
            query_tokens.select("query_id", "vec")
            .groupBy("query_id")
            .applyInPandas(run, schema="query_id long, code long")
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
        self._live_caches.append(query_tokens)

        n_probe = p.n_ivf_probe
        # exact configuration (every cell probed, t_cs off): Q4 probe
        # scaling and eligible-cell probe restriction cannot change which
        # cells are probed, so their two eager driver jobs (subset count +
        # eligible-code collect) are pure overhead — the subset-restricted
        # IVF below already enforces the filter on Q5 candidates alone
        probe_all = (p.n_ivf_probe >= idx.meta.k
                     and p.centroid_score_threshold == float("-inf"))
        if subset is not None:
            subset = subset.select(F.col("doc_id").cast("long")).distinct().cache()
            self._live_caches.append(subset)
            if not probe_all:
                # Q4: widen the probe when the filter is selective
                # (n_probe · n_docs/|subset|, capped — search.rs:370-382)
                subset_len = subset.count()
                if subset_len > 0:
                    scale = min(
                        max(1, int(idx.meta.num_documents / subset_len)),
                        p.max_probe_scale,
                    )
                    n_probe = min(p.n_ivf_probe * scale, idx.meta.k)

        # subset-pruned IVF feeds Q5 under every strategy
        ivf = idx.ivf
        eligible_mask = None
        if subset is not None:
            # eligible-centroid pruning under filter (search.rs:350-364):
            # only cells containing subset docs can contribute
            restricted = ivf.select(
                "code", F.explode("doc_ids").alias("doc_id")
            ).join(subset, "doc_id", "left_semi")
            if probe_all:
                # every consumer re-explodes doc_ids right away, so the
                # per-cell list regroup is a wasted corpus-sized shuffle
                # here — singleton arrays keep the schema, shuffle-free
                ivf = restricted.select(
                    "code", F.array("doc_id").alias("doc_ids"))
            else:
                # the approximate path probes few cells: per-cell lists keep
                # the cells→candidates join |cells|-sized, and the eligible
                # collect below needs one row per cell
                ivf = restricted.groupBy("code").agg(
                    F.collect_list("doc_id").alias("doc_ids"))
            ivf = ivf.cache()
            self._live_caches.append(ivf)
        if subset is not None and not probe_all:
            # the probe pool itself is restricted to those eligible cells
            # (search.rs:350-364): rank probe slots among them only, and cap
            # the scaled n_probe at the eligible-cell count. The collect is
            # bounded by K — the same order as the centroid matrix already
            # held driver-side.
            eligible = np.fromiter(
                (r.code for r in ivf.select("code").collect()), dtype=np.int64
            )
            if len(eligible) == 0:
                # filter excludes every indexed doc → empty result
                return query_tokens.sparkSession.createDataFrame(
                    [], schema="query_id long, doc_id long, score double, rank int"
                )
            eligible_mask = np.zeros(idx.meta.k, dtype=bool)
            eligible_mask[eligible] = True
            n_probe = min(n_probe, len(eligible))

        has_token = "token" in query_tokens.columns
        strategy = self.approx_strategy
        qt_pdf = None
        cols = ["query_id", "token_idx", "vec"] + (
            ["token"] if has_token else []
        )
        if strategy == "auto":
            # broadcast while the batch's [q_tokens, K] score matrix fits.
            # Decide WITHOUT a separate count job: collect the token pdf
            # under a limit of cap+1 rows — the pdf itself is [ntok, dim],
            # dim ≪ K times smaller than the score matrix the budget
            # admits, so within-cap collection is affordable by
            # construction; cap+1 rows back means over budget (discard,
            # go chunked). One driver roundtrip replaces count+toPandas.
            cap = max(1, self.broadcast_budget_bytes // (idx.meta.k * 8))
            pdf = query_tokens.select(*cols).limit(cap + 1).toPandas()
            if len(pdf) <= cap:
                strategy = "broadcast"
                qt_pdf = pdf.sort_values(
                    ["query_id", "token_idx"], kind="stable"
                ).reset_index(drop=True)
            else:
                strategy = "chunked"
        elif strategy == "broadcast":
            qt_pdf = (
                query_tokens.select(*cols)
                .sort("query_id", "token_idx")
                .toPandas()
            )
        if strategy == "broadcast":
            # the single collect serves the kernel's token matrix, the
            # probe, AND the rerank-budget stats
            qstats = {
                "ntok": len(qt_pdf),
                "nq": int(qt_pdf["query_id"].nunique()),
                "nv": int(qt_pdf["token"].nunique()) if has_token else len(qt_pdf),
            }
        else:
            # chunked/kernel/relational: stats via one small agg job (the
            # token table never reaches the driver whole in these modes)
            qstats = query_tokens.agg(
                F.count("*").alias("ntok"),
                F.countDistinct("query_id").alias("nq"),
                (F.countDistinct("token") if has_token else F.count("*")).alias("nv"),
            ).collect()[0]
            if strategy == "chunked":
                # the RAW token pdf is dim/K times smaller than the score
                # matrix that forced chunking — when it fits the same
                # budget, collect it so Q9 can still run as the broadcast
                # kernel (the approx stage stays chunked either way)
                if qstats["ntok"] * idx.meta.dim * 8 <= self.broadcast_budget_bytes:
                    qt_pdf = (
                        query_tokens.select("query_id", "token_idx", "vec")
                        .sort("query_id", "token_idx")
                        .toPandas()
                    )

        # Exact configuration shortcut (probe_all + survivor cut ≥ corpus):
        # every candidate doc of every query survives the Q7/Q8 cut, so the
        # whole approximate phase — the driver [V, K] score matrix, the
        # codes-only kernel, the rank window and the survivors cache — is a
        # no-op selector whose scores are entirely discarded. Q9 runs
        # directly over all (query, candidate-doc) pairs: under probe_all
        # the candidates are exactly the indexed docs (∩ subset), and the
        # per-doc query lists are one literal array. Bit-identical results
        # (the rerank kernel receives the same rows); pinned by
        # test_exact_all_pairs_shortcut_matches_funnel.
        _cut = min(p.n_full_scores, max(p.n_full_scores // 4, p.top_k))
        if (probe_all and qt_pdf is not None and len(qt_pdf)
                and _cut >= idx.meta.num_documents):
            return topk(self._rerank_all_pairs(qt_pdf, subset), p.top_k)

        if strategy in ("broadcast", "chunked"):
            # Q1–Q6 in one shot: probe/prune driver-side, candidacy and
            # approx scoring in the doc-parallel kernel; chunk-local
            # pre-prune to the Q7/Q8 cut
            cut = _cut
            if strategy == "broadcast":
                approx = self._approx_broadcast(
                    query_tokens, n_probe, p, ivf, prune_to=cut,
                    eligible_mask=eligible_mask, qt_pdf=qt_pdf,
                )
            else:
                approx = self._approx_chunked(
                    query_tokens, n_probe, p, ivf, prune_to=cut,
                    eligible_mask=eligible_mask, ntok=int(qstats["ntok"]),
                    qt_pdf=qt_pdf,
                )
        else:
            # Q1+Q2+Q3 fused in one grouped kernel (was: probe mapInPandas →
            # broadcast-centroid re-score join → window — the re-score join
            # exploded |probed cells| × |q_tokens| rows with vector payloads,
            # the dominant cost of the non-broadcast strategies at batch500)
            cells = self._probe_cells(
                query_tokens, n_probe, p, eligible_mask=eligible_mask)

            # Q5: candidates = ∪ IVF lists of surviving cells (∩ subset).
            # The union runs as a per-query array flatten+dedup — one
            # shuffle of |surviving (query, cell)| fat rows — instead of
            # exploding to (query, doc) rows *before* the dedup shuffle
            # (measured 4.5× faster at sf0.1: the explode+distinct form
            # shuffles every duplicate occurrence). Each query's array is
            # bounded by its probed cells' IVF mass — the same per-query
            # volume the cogrouped kernel shuffles downstream anyway; the
            # production batch path (broadcast/chunked) never builds
            # per-query lists at all.
            candidates = (
                cells.join(ivf, "code")
                .groupBy("query_id")
                .agg(F.array_distinct(F.flatten(F.collect_list("doc_ids"))).alias("_cand"))
                .select("query_id", F.explode("_cand").alias("doc_id"))
            ).cache()  # consumed twice: pair join + cand_docs semi-join
            self._live_caches.append(candidates)
            # Q6: approximate scoring on codes only — never touches residuals.
            # Per-doc code sets come from the precomputed doc_codes index
            # artifact (the codes.npy analog): read + semi-join, no per-batch
            # corpus aggregation. Fallback for legacy indexes: semi-join the
            # corpus down to candidate docs BEFORE the distinct, otherwise
            # the dedup shuffles the full corpus per batch (Catalyst won't
            # push a join under an aggregate on its own).
            cand_docs = candidates.select("doc_id").distinct()
            pre = idx.doc_codes
            if pre is not None:
                doc_lists = pre.join(cand_docs, "doc_id", "left_semi")
            else:
                doc_lists = (
                    idx.tokens.join(cand_docs, "doc_id", "left_semi")
                    .select("doc_id", "code")
                    .distinct()
                    .groupBy("doc_id")
                    .agg(F.collect_list("code").alias("codes"))
                )
            if strategy == "kernel":
                approx = self._approx_kernel(query_tokens, candidates, doc_lists)
            else:
                approx = self._approx_relational(
                    query_tokens, candidates,
                    doc_lists.select("doc_id", F.explode("codes").alias("code")),
                )

        # Q7 + Q8: approx top n_full_scores, then decompress budget n/4
        budget = max(p.n_full_scores // 4, p.top_k)
        w = Window.partitionBy("query_id").orderBy(
            F.col("approx_score").desc(), F.col("doc_id").asc()
        )
        # cached: survivors is the cut of the ENTIRE approximate-scoring
        # subtree and every rerank path consumes it more than once (the
        # broadcast kernel packs doc lists and query lists from it, the
        # relational chain semi-joins tokens and joins pairs) — uncached,
        # Q1-Q7 would re-run per consumer. Bounded at n_queries · budget
        # (query_id, doc_id) rows; released with the other per-query
        # caches via release().
        survivors = (
            approx.withColumn("arank", F.row_number().over(w))
            .filter(F.col("arank") <= min(p.n_full_scores, budget))
            .select("query_id", "doc_id")
        ).cache()
        self._live_caches.append(survivors)

        if qt_pdf is not None and len(qt_pdf):
            # broadcast path: Q9 as one doc-parallel kernel (bit-identical
            # to the relational chain below — see _rerank_broadcast)
            return topk(self._rerank_broadcast(survivors, qt_pdf), p.top_k)

        # Q9: decompress survivors and exact-MaxSim them. Quantization makes
        # token vectors a pure function of (code, residual), so each distinct
        # quantized vector is decompressed and dotted against the query side
        # ONCE. With a deterministic encoder (token column present) the dot
        # table shrinks further to |query vocab| × |distinct quantized vecs|
        # and the per-doc maxima are shared across queries — the same CSE as
        # maxsim_scores_by_token, bit-identical (max over the same multiset,
        # same sorted fold).
        surv_tokens = idx.tokens.join(
            survivors.select("doc_id").distinct(), "doc_id", "left_semi"
        ).select("doc_id", "code", "residual")
        uniq_vecs = decompress(
            surv_tokens.select("code", "residual").distinct(),
            self._centroids, idx.meta.codec,
        )
        fold = lambda col: F.aggregate(  # noqa: E731
            F.array_sort(F.collect_list(col)),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        ).alias("score")

        # Budget check on the vocab dot table (the one nested-loop join in
        # the funnel). Upper-bound estimate from known quantities — the
        # batch-stats row collected up top, index metadata for the doc
        # side: survivors ≤ n_queries·budget docs, each contributing
        # ≤ avg_doclen distinct quantized vecs. Above budget, the per-query
        # equi-join fallback computes the same dots (same expressions, same
        # max/fold order — bit-identical) restricted to surviving pairs,
        # with no cartesian product.
        est_uniq_vecs = (
            min(qstats["nq"] * budget, idx.meta.num_documents)
            * max(idx.meta.avg_doclen, 1.0)
        )
        cse_dots_ok = est_uniq_vecs * max(qstats["nv"], 1) <= RERANK_DOT_BUDGET_ROWS

        if has_token and not cse_dots_ok:
            q_tok = query_tokens.select(
                "query_id", "token", F.col("vec").alias("q_vec")
            ).dropDuplicates(["query_id", "token"])
            per_doc_token = (
                survivors.join(q_tok, "query_id")
                .join(surv_tokens.distinct(), "doc_id")
                .join(uniq_vecs, ["code", "residual"])
                .groupBy("query_id", "doc_id", "token")
                .agg(F.max(dot(F.col("q_vec"), F.col("vec"))).alias("max_dp"))
            )
            exact = (
                survivors.join(
                    query_tokens.select("query_id", "token_idx", "token"),
                    "query_id",
                )
                .join(per_doc_token, ["query_id", "doc_id", "token"])
                .groupBy("query_id", "doc_id")
                .agg(fold("max_dp"))
            )
        elif not has_token and not cse_dots_ok:
            qt = query_tokens.select(
                "query_id", F.col("token_idx").alias("q_token_idx"),
                F.col("vec").alias("q_vec"),
            )
            exact = (
                survivors.join(surv_tokens, "doc_id")
                .join(uniq_vecs, ["code", "residual"])
                .join(qt, "query_id")
                .groupBy("query_id", "doc_id", "q_token_idx")
                .agg(F.max(dot(F.col("q_vec"), F.col("vec"))).alias("max_dp"))
                .groupBy("query_id", "doc_id")
                .agg(fold("max_dp"))
            )
        elif has_token:
            q_vocab = query_tokens.select(
                "token", F.col("vec").alias("q_vec")
            ).dropDuplicates(["token"])
            vocab_dots = uniq_vecs.crossJoin(F.broadcast(q_vocab)).select(
                "code", "residual", "token",
                dot(F.col("q_vec"), F.col("vec")).alias("dp"),
            )
            doc_sets = surv_tokens.distinct()
            per_doc_token = (
                doc_sets.join(vocab_dots, ["code", "residual"])
                .groupBy("doc_id", "token")
                .agg(F.max("dp").alias("max_dp"))
            )
            exact = (
                survivors.join(
                    query_tokens.select("query_id", "token_idx", "token"),
                    "query_id",
                )
                .join(per_doc_token, ["doc_id", "token"])
                .groupBy("query_id", "doc_id")
                .agg(fold("max_dp"))
            )
        else:
            qt = query_tokens.select(
                "query_id", F.col("token_idx").alias("q_token_idx"),
                F.col("vec").alias("q_vec"),
            )
            pair_dots = uniq_vecs.crossJoin(qt).select(
                "code", "residual", "query_id", "q_token_idx",
                dot(F.col("q_vec"), F.col("vec")).alias("dp"),
            )
            exact = (
                survivors.join(surv_tokens, "doc_id")
                .join(pair_dots, ["query_id", "code", "residual"])
                .select("query_id", "doc_id", "q_token_idx", "dp")
                .groupBy("query_id", "doc_id", "q_token_idx")
                .agg(F.max("dp").alias("max_dp"))
                .groupBy("query_id", "doc_id")
                .agg(fold("max_dp"))
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

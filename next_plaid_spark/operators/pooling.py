"""Hierarchical token pooling — P6 (SURVEY.md §2.7).

The reference pools document token embeddings with a scipy-compatible
Ward linkage over COSINE distances into ⌊tokens/pool_factor⌋ mean-pooled
vectors, protecting the first ``protected_tokens`` rows
(next-plaid-onnx/src/lib.rs:2248-2318 ``pool_embeddings_hierarchical``,
hierarchy.rs:1-660). scipy is absent in this container, so the full
pipeline is implemented in pure NumPy, mirroring the reference exactly:

- ``pdist_cosine``        — condensed 1−cos distance matrix, float64
                            (hierarchy.rs:599-653; zero-norm rows get
                            similarity 0, distances clamped to [0, 2]).
- ``linkage_ward``        — O(n²) nearest-neighbor-chain Ward linkage on
                            squared distances with the Lance-Williams
                            update; merges recorded in chain order as
                            scipy-format rows [i, j, dist, size]
                            (hierarchy.rs:113-258).
- ``fcluster_maxclust``   — flat clusters from the first n−t merges via
                            union-find, 1-based labels in first-appearance
                            order (hierarchy.rs:404-517).
- ``pool_embeddings_hierarchical`` — protected rows verbatim, then one
                            MEAN vector per cluster in label order, NOT
                            renormalized (lib.rs:2286-2318); cluster count
                            is ⌊pool/pool_factor⌋ (floor), min 1.

Per-doc token counts are ≤ a few hundred, so the per-doc NumPy kernel is
immaterial next to the model forward pass; it runs inside the same
mapInPandas encode stage (no extra shuffle) via
``encode_udf.encode_documents_with_model(pool_factor=…)``, or standalone
over a token DataFrame via ``pool_doc_tokens`` (applyInPandas by doc).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


# ---------------------------------------------------------------------------
# scipy-compatible kernel (pure NumPy)
# ---------------------------------------------------------------------------

def pdist_cosine(x: np.ndarray) -> np.ndarray:
    """Condensed cosine-distance matrix (float64), reference
    hierarchy.rs:599-653: d = clamp(1 − cos_sim, 0, 2); rows with zero
    norm get cos_sim = 0 (d = 1)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    norms = np.linalg.norm(x, axis=1)
    dots = x @ x.T
    with np.errstate(divide="ignore", invalid="ignore"):
        sim = dots / np.outer(norms, norms)
    sim[~np.isfinite(sim)] = 0.0
    d = np.clip(1.0 - sim, 0.0, 2.0)
    iu = np.triu_indices(n, k=1)
    return d[iu]


def pdist_euclidean(x: np.ndarray) -> np.ndarray:
    """Condensed euclidean-distance matrix (float64)."""
    x = np.asarray(x, dtype=np.float64)
    sq = (x * x).sum(axis=1)
    d2 = np.maximum(sq[:, None] + sq[None, :] - 2.0 * (x @ x.T), 0.0)
    iu = np.triu_indices(x.shape[0], k=1)
    return np.sqrt(d2[iu])


def linkage_ward(distances: np.ndarray, n: int) -> np.ndarray:
    """Ward linkage via the nearest-neighbor chain algorithm — a faithful
    NumPy port of the reference's hierarchy.rs:128-258 (same squared-
    distance Lance-Williams update, same chain-order merge recording, same
    first-minimum tie-break scanning the active list in order).

    Returns the scipy-format [n−1, 4] matrix: each row
    ``[min_idx, max_idx, sqrt(d²), size]`` with merged-cluster ids
    n, n+1, … in merge order. NOTE (reference quirk, kept deliberately):
    rows are in chain order, NOT globally sorted by distance the way
    scipy's own output is.
    """
    if n <= 1:
        return np.empty((0, 4), dtype=np.float64)
    total = 2 * n - 1
    dist_sq = np.full((total, total), np.inf, dtype=np.float64)
    iu = np.triu_indices(n, k=1)
    dsq = np.asarray(distances, dtype=np.float64) ** 2
    dist_sq[iu] = dsq
    dist_sq[(iu[1], iu[0])] = dsq
    np.fill_diagonal(dist_sq[:n, :n], 0.0)

    sizes = np.ones(total, dtype=np.int64)
    active: list[int] = list(range(n))
    next_cluster = n
    chain: list[int] = []
    out = np.empty((n - 1, 4), dtype=np.float64)

    def nearest(i: int) -> tuple[int, float]:
        # first minimum over the active list in order (reference tie-break)
        best_j, best_d = -1, np.inf
        row = dist_sq[i]
        for j in active:
            if j != i and row[j] < best_d:
                best_d = row[j]
                best_j = j
        return best_j, best_d

    for step in range(n - 1):
        if not chain:
            chain.append(active[0])
        while True:
            current = chain[-1]
            nn, nn_d = nearest(current)
            if len(chain) >= 2 and chain[-2] == nn:
                a = chain.pop()
                b = chain.pop()
                na, nb = int(sizes[a]), int(sizes[b])
                out[step] = (min(a, b), max(a, b), np.sqrt(nn_d), na + nb)
                active.remove(a)
                active.remove(b)
                sizes[next_cluster] = na + nb
                if active:
                    ks = np.asarray(active, dtype=np.int64)
                    nk = sizes[ks].astype(np.float64)
                    new_d = (
                        (na + nk) * dist_sq[a, ks]
                        + (nb + nk) * dist_sq[b, ks]
                        - nk * nn_d
                    ) / (na + nb + nk)
                    dist_sq[next_cluster, ks] = new_d
                    dist_sq[ks, next_cluster] = new_d
                active.append(next_cluster)
                next_cluster += 1
                break
            chain.append(nn)
    return out


def fcluster_maxclust(Z: np.ndarray, n: int, t: int) -> np.ndarray:
    """Flat clusters limited to ``t`` — 1-based labels in first-appearance
    order over observations (reference hierarchy.rs:426-517: union-find
    over the FIRST n−t linkage rows, in recorded order)."""
    if t >= n:
        return np.arange(1, n + 1, dtype=np.int64)
    if t <= 0:
        return np.ones(n, dtype=np.int64)
    parent = np.arange(n, dtype=np.int64)

    def find(i: int) -> int:
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:  # path compression
            parent[i], i = root, parent[i]
        return root

    # representative observation per cluster id (follows the first-column
    # chain, like find_observation_in_cluster)
    rep = list(range(n)) + [0] * (len(Z))
    for row_idx in range(len(Z)):
        c1 = int(Z[row_idx, 0])
        rep[n + row_idx] = rep[c1]
    for row_idx in range(n - t):
        o1, o2 = rep[int(Z[row_idx, 0])], rep[int(Z[row_idx, 1])]
        r1, r2 = find(o1), find(o2)
        if r1 != r2:
            parent[r2] = r1
    labels = np.zeros(n, dtype=np.int64)
    seen: dict[int, int] = {}
    for i in range(n):
        root = find(i)
        if root not in seen:
            seen[root] = len(seen) + 1
        labels[i] = seen[root]
    return labels


def ward_cluster(x: np.ndarray, n_clusters: int, *,
                 metric: str = "euclidean") -> np.ndarray:
    """Agglomerative Ward: [n, d] → 0-based cluster label per row, labels
    in first-appearance order (linkage + fcluster-maxclust)."""
    n = x.shape[0]
    if n_clusters >= n:
        return np.arange(n)
    d = pdist_cosine(x) if metric == "cosine" else pdist_euclidean(x)
    Z = linkage_ward(d, n)
    return fcluster_maxclust(Z, n, n_clusters) - 1


def pool_embeddings_hierarchical(emb: np.ndarray, pool_factor: int,
                                 protected_tokens: int = 1) -> np.ndarray:
    """One document's [n, d] token matrix → pooled matrix, mirroring
    lib.rs:2248-2318 exactly: first ``protected_tokens`` rows verbatim;
    the rest Ward-clustered (cosine distance) into
    max(⌊rest/pool_factor⌋, 1) clusters; one MEAN vector per cluster in
    label order — no renormalization. Degenerate inputs pass through
    unchanged (n ≤ protected+1, or cluster count ≥ rest)."""
    emb = np.asarray(emb, dtype=np.float64)
    n = emb.shape[0]
    if n <= protected_tokens + 1:
        return emb
    rest = n - protected_tokens
    k = max(rest // pool_factor, 1)
    if k >= rest:
        return emb
    to_pool = emb[protected_tokens:]
    labels = fcluster_maxclust(
        linkage_ward(pdist_cosine(to_pool), rest), rest, k
    )
    out = np.empty((protected_tokens + k, emb.shape[1]), dtype=np.float64)
    out[:protected_tokens] = emb[:protected_tokens]
    for lbl in range(1, k + 1):
        m = labels == lbl
        out[protected_tokens + lbl - 1] = (
            to_pool[m].mean(axis=0) if m.any() else 0.0
        )
    return out


# ---------------------------------------------------------------------------
# Standalone DataFrame operator
# ---------------------------------------------------------------------------

def pool_doc_tokens(doc_tokens: DataFrame, *, pool_factor: int = 2,
                    protected_tokens: int = 0) -> DataFrame:
    """(doc_id, token_idx, vec) → pooled (doc_id, token_idx, vec) with the
    reference's exact pooling semantics. pool_factor ≤ 1 is a no-op,
    matching the reference's gate (lib.rs:1634-1643)."""
    if pool_factor <= 1:
        return doc_tokens

    def pool(pdf):
        import pandas as pd

        pdf = pdf.sort_values("token_idx")
        doc_id = pdf["doc_id"].iloc[0]
        vecs = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
        out = pool_embeddings_hierarchical(
            vecs, pool_factor, protected_tokens
        )
        return pd.DataFrame(
            {"doc_id": doc_id, "token_idx": range(len(out)),
             "vec": [list(v) for v in out]}
        )

    return doc_tokens.groupBy("doc_id").applyInPandas(
        pool, schema="doc_id long, token_idx int, vec array<double>"
    )

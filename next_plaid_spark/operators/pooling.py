"""Hierarchical token pooling — P6 (SURVEY.md §2.7).

The reference pools document token embeddings with scipy-compatible Ward
linkage into ⌈tokens/pool_factor⌉ mean-pooled vectors, protecting the first
``protected_tokens`` rows (next-plaid-onnx/src/lib.rs:2248-2318,
hierarchy.rs). scipy is absent here, so Ward linkage is implemented
directly (Lance-Williams update on squared-euclidean merge costs — the same
recurrence scipy's NN-chain computes); per-doc token counts are ≤ a few
hundred, so the O(n³) driver loop inside the per-doc UDF is immaterial.

Runs as applyInPandas grouped by doc — the same executor-side seam the
encode UDF would use.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ward_cluster(x: np.ndarray, n_clusters: int) -> np.ndarray:
    """Agglomerative Ward: [n, d] → cluster label per row (0..k−1).

    Merge cost follows the Lance-Williams/Ward objective: Δ(A,B) =
    |A||B|/(|A|+|B|) · ||μ_A − μ_B||². Deterministic: ties break on the
    smallest (i, j) pair.
    """
    n = x.shape[0]
    if n_clusters >= n:
        return np.arange(n)
    active = list(range(n))
    sizes = {i: 1 for i in range(n)}
    centroids = {i: x[i].astype(np.float64) for i in range(n)}
    members: dict[int, list[int]] = {i: [i] for i in range(n)}
    next_id = n
    while len(active) > n_clusters:
        best = None
        for ai in range(len(active)):
            for bi in range(ai + 1, len(active)):
                a, b = active[ai], active[bi]
                na, nb = sizes[a], sizes[b]
                d = centroids[a] - centroids[b]
                cost = (na * nb) / (na + nb) * float(d @ d)
                key = (cost, a, b)
                if best is None or key < best:
                    best = key
        _, a, b = best
        na, nb = sizes[a], sizes[b]
        centroids[next_id] = (na * centroids[a] + nb * centroids[b]) / (na + nb)
        sizes[next_id] = na + nb
        members[next_id] = members[a] + members[b]
        for gone in (a, b):
            active.remove(gone)
            del centroids[gone], sizes[gone], members[gone]
        active.append(next_id)
        next_id += 1
    labels = np.empty(n, dtype=np.int64)
    for lbl, cid in enumerate(sorted(active, key=lambda c: min(members[c]))):
        labels[members[cid]] = lbl
    return labels


def pool_doc_tokens(doc_tokens: DataFrame, *, pool_factor: int = 2,
                    protected_tokens: int = 0) -> DataFrame:
    """(doc_id, token_idx, vec) → pooled (doc_id, token_idx, vec):
    first ``protected_tokens`` kept verbatim, the rest Ward-clustered into
    ⌈rest/pool_factor⌉ mean vectors (L2-renormalized). pool_factor ≤ 1 is a
    no-op, matching the reference's gate."""
    if pool_factor <= 1:
        return doc_tokens

    def pool(pdf):
        import pandas as pd

        pdf = pdf.sort_values("token_idx")
        doc_id = pdf["doc_id"].iloc[0]
        vecs = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf["vec"]])
        prot = vecs[:protected_tokens]
        rest = vecs[protected_tokens:]
        out = [v for v in prot]
        if len(rest):
            k = max(1, int(np.ceil(len(rest) / pool_factor)))
            labels = ward_cluster(rest, k)
            for lbl in range(labels.max() + 1):
                m = rest[labels == lbl].mean(axis=0)
                norm = np.linalg.norm(m)
                out.append(m / norm if norm > 0 else m)
        return pd.DataFrame(
            {"doc_id": doc_id, "token_idx": range(len(out)),
             "vec": [list(v) for v in out]}
        )

    return doc_tokens.groupBy("doc_id").applyInPandas(
        pool, schema="doc_id long, token_idx int, vec array<double>"
    )

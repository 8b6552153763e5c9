"""Coarse quantizer training — B1/B2/B3/B4 (SURVEY.md §2.3).

Parity targets:
- K heuristic: ``K = 2^⌊log2(16·√total_tokens)⌋`` (next-plaid/src/kmeans.rs:303-312).
- Sampling budget: ``n_samples = min(1 + 16·√(120·n_docs), n_docs)`` documents
  (kmeans.rs:272-301) — we sample *tokens* with an equivalent budget since the
  exploded layout has no per-doc matrices.
- Lloyd's: 4 iterations, seed 42, centroids L2-normalized afterwards
  (kmeans.rs:261-422). We test invariants (normalization, K, assignment =
  argmax dot), not bit-parity with fastkmeans-rs (SURVEY §7 risk register).

Execution model: train on a driver-side sample (small), broadcast the
centroid matrix, assign codes executor-side with one BLAS GEMM per Arrow
batch. At K beyond ~1M centroids the broadcast stops being viable and
assignment becomes a bucketed join — out of scope for this corpus, noted in
plans/builder.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SEED = 42
DEFAULT_ITERS = 4
MAX_POINTS_PER_CENTROID = 256  # kmeans.rs:58-71

# assignment-kernel score-matrix budget: argmax over X@Cᵀ materializes an
# [n, K] f32 block; beyond this many bytes the kernel row-chunks the GEMM.
# r14 measurement: at K≈5-8k a full-partition batch allocates a 190-670 MB
# score matrix per Python worker; 32 workers allocating simultaneously
# triggered a page-fault/THP-compaction storm (reproduced OUTSIDE Spark:
# 32 concurrent processes' first GEMM+argmax of this shape took 22-34 s
# each vs 0.15 s for the row-chunked form) and the fused encode stage read
# 115-968 s of executor time across runs. Chunking bounds every worker's
# transient to ~32 MB (malloc reuses the freed block across iterations) and
# is ~2× faster even single-process — the argmax scan is memory-bound.
# Gate-scale partitions (sf0.01: ≤1k rows × K=2048 ≈ 6 MB) stay under the
# threshold on the exact single-GEMM path, bit-identical to prior rounds;
# above it, row-chunking can shift a score by ≤1 ulp (BLAS blocking differs
# with m), which both assignment kernels share identically via this helper.
ASSIGN_CHUNK_BYTES = 32 * 1024 * 1024


def _argmax_codes(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """argmax(X @ Cᵀ) with the score matrix bounded to ASSIGN_CHUNK_BYTES."""
    n, k = x.shape[0], c.shape[0]
    if n * k * 4 <= ASSIGN_CHUNK_BYTES:
        return np.argmax(x @ c.T, axis=1).astype(np.int64)
    bs = max(1, ASSIGN_CHUNK_BYTES // (k * 4))
    codes = np.empty(n, dtype=np.int64)
    for s in range(0, n, bs):
        codes[s : s + bs] = np.argmax(x[s : s + bs] @ c.T, axis=1)
    return codes


def estimate_k(total_tokens: int) -> int:
    """2^⌊log2(16·√tokens)⌋ (kmeans.rs:303-309); ≥1."""
    if total_tokens <= 0:
        return 1
    return max(1, 2 ** int(math.floor(math.log2(16.0 * math.sqrt(total_tokens)))))


def sample_token_budget(n_docs: int, avg_doclen: float) -> int:
    """Token-count equivalent of the reference's doc sampling budget."""
    n_doc_samples = min(1 + int(16.0 * math.sqrt(120.0 * n_docs)), max(n_docs, 1))
    return max(1, int(n_doc_samples * max(avg_doclen, 1.0)))


@dataclass
class KMeansModel:
    centroids: np.ndarray  # [K, dim] float32, L2-normalized rows

    @property
    def k(self) -> int:
        return self.centroids.shape[0]

    @property
    def dim(self) -> int:
        return self.centroids.shape[1]


def lloyds(points: np.ndarray, k: int, *, iters: int = DEFAULT_ITERS,
           seed: int = DEFAULT_SEED) -> np.ndarray:
    """Plain Lloyd's on unit vectors (argmax-dot assignment ≡ min-L2).

    Deterministic under (points, k, seed). Empty clusters keep their previous
    centroid. Returns L2-normalized [k, dim] float32.
    """
    pts = np.asarray(points, dtype=np.float32)
    n = pts.shape[0]
    k = min(k, n)
    rng = np.random.default_rng(seed)
    centroids = pts[rng.choice(n, size=k, replace=False)].copy()
    for _ in range(iters):
        # batched GEMM to bound memory (codec.rs 1 GB cap analog)
        assign = np.empty(n, dtype=np.int64)
        bs = max(1, int(64_000_000 / max(k, 1)))
        for s in range(0, n, bs):
            assign[s : s + bs] = np.argmax(pts[s : s + bs] @ centroids.T, axis=1)
        sums = np.zeros_like(centroids, dtype=np.float64)
        np.add.at(sums, assign, pts)
        counts = np.bincount(assign, minlength=k).astype(np.float64)
        nonempty = counts > 0
        centroids[nonempty] = (sums[nonempty] / counts[nonempty, None]).astype(np.float32)
    norms = np.linalg.norm(centroids, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return (centroids / norms).astype(np.float32)


def train_kmeans(
    doc_tokens: DataFrame,
    *,
    vec_col: str = "vec",
    k: int | None = None,
    seed: int = DEFAULT_SEED,
    iters: int = DEFAULT_ITERS,
    sample_budget: int | None = None,
    n_tokens: int | None = None,
    n_docs: int | None = None,
) -> KMeansModel:
    """Sample tokens → driver Lloyd's → KMeansModel.

    At most one aggregate (skipped when the caller already has the corpus
    stats) + one sampled distinct collect; everything else stays distributed.
    """
    if n_tokens is None or n_docs is None:
        stats = doc_tokens.agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("doc_id").alias("n_docs"),
        ).collect()[0]
        n_tokens, n_docs = stats.n_tokens, stats.n_docs
    if k is None:
        k = estimate_k(n_tokens)
    if sample_budget is None:
        sample_budget = sample_token_budget(n_docs, n_tokens / max(n_docs, 1))
    sample_budget = max(sample_budget, min(n_tokens, k * 4))
    frac = min(1.0, sample_budget / max(n_tokens, 1))
    sampled = doc_tokens.select(vec_col)
    if frac < 1.0:
        sampled = sampled.sample(fraction=min(1.0, frac * 1.1), seed=seed)
    # dedup executor-side: Lloyd's input is np.unique'd anyway (ghost-centroid
    # note below), so only distinct vectors need to reach the driver — on a
    # repetitive corpus this collects KBs instead of the whole sample
    pts = np.asarray([r[0] for r in sampled.distinct().collect()], dtype=np.float32)
    # duplicate points contribute nothing to Lloyd's but seed duplicate
    # ("ghost") centroids that no token ever assigns to — the IVF probe then
    # ranks cells that exist in no inverted list. Cap K by the distinct
    # point count (real contextual embeddings are effectively all-distinct,
    # so this is a no-op there; the deterministic synthetic encoder is not).
    # unique() also sorts rows, making the result independent of the
    # distinct() shuffle's collect order.
    pts = np.unique(pts, axis=0)
    # cap points per centroid like the reference's subsample (kmeans.rs:58-71)
    cap = MAX_POINTS_PER_CENTROID * k
    if pts.shape[0] > cap:
        rng = np.random.default_rng(seed)
        pts = pts[np.sort(rng.choice(pts.shape[0], size=cap, replace=False))]
    k = min(k, pts.shape[0])
    return KMeansModel(centroids=lloyds(pts, k, iters=iters, seed=seed))


def train_kmeans_distributed(
    doc_tokens: DataFrame,
    *,
    vec_col: str = "vec",
    k: int,
    seed: int = DEFAULT_SEED,
    iters: int = DEFAULT_ITERS,
) -> KMeansModel:
    """Fully distributed trainer (``pyspark.ml.clustering.KMeans``) for
    corpora where the reference's sample-size law outgrows any driver
    sample: n_samples = 1 + 16·√(120·n_docs) (kmeans.rs:272-301) passes
    the 65,536-row driver cap around ~140k docs, and at 100 TB the
    coarse quantizer should see the whole distribution, not a capped
    slice. Spark's k-means|| init + distributed Lloyd's never collects
    the corpus; only the [K, dim] centers come back.

    Trades the sample path's seed-for-seed reproducibility (Spark ML's
    parallelism-dependent init) for unbounded training data — which is
    why the funnel gates on recall invariants, not centroid bits, for
    this path. Centroids are L2-normalized like the reference
    (kmeans.rs:414-419)."""
    from pyspark.ml.clustering import KMeans as MLKMeans
    from pyspark.ml.functions import array_to_vector

    feat = doc_tokens.select(
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features")
    )
    model = MLKMeans(
        k=k, maxIter=iters, seed=seed, initMode="k-means||",
        featuresCol="features",
    ).fit(feat)
    c = np.asarray(model.clusterCenters(), dtype=np.float32)
    norms = np.linalg.norm(c, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return KMeansModel(centroids=np.unique(c / norms, axis=0))


def assign_codes(doc_tokens: DataFrame, centroids: np.ndarray,
                 *, vec_col: str = "vec") -> DataFrame:
    """B4 ``compress_into_codes`` (codec.rs:260-343): nearest-centroid id per
    token via argmax(X @ Cᵀ), one GEMM per Arrow batch, executor-side.

    Adds ``code BIGINT``. The centroid matrix rides the closure (Spark
    broadcasts the serialized function once per executor).
    """
    import pandas as pd

    c = np.ascontiguousarray(centroids, dtype=np.float32)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in doc_tokens.schema.fields
    ) + ", code long"

    def assign(batches):
        for pdf in batches:
            if len(pdf):
                x = np.vstack(pdf[vec_col].to_numpy()).astype(np.float32)
                pdf = pdf.copy()
                pdf["code"] = _argmax_codes(x, c)
            else:
                pdf = pdf.assign(code=pd.Series([], dtype="int64"))
            yield pdf

    return doc_tokens.mapInPandas(assign, schema=out_schema)

"""Deterministic synthetic multi-vector encoder (text → token embeddings).

The reference encodes text with an ONNX ColBERT model
(next-plaid-onnx/src/lib.rs:1100-1360) producing an L2-normalized
``[num_tokens, dim]`` f32 matrix per document; queries get ``[Q]``-prefix +
MASK expansion (lib.rs:576-590). Models are unavailable in CI, so — per
SURVEY.md §7 phase 1 — we synthesize embeddings deterministically from the
*token content*: the same token always maps to the same unit vector, which
gives the corpus real cluster structure (same-token hits dominate MaxSim) and
makes recall measurable.

Derivation (bit-identical in Spark and DuckDB, which is what makes the whole
MaxSim pipeline oracle-checkable):

    raw[i]  = int(md5(token || ':' || i)[0:8 hex], 16) / 2^31  -  1.0
    vec     = raw / ||raw||_2

md5 agrees byte-for-byte across engines; the rest is exact integer/power-of-2
arithmetic followed by one double-precision left-fold for the norm.

Everything is built-in Spark functions — encoding runs JVM-side inside
whole-stage codegen, scales linearly, and needs no Python workers. A real
model plugs in as a ``mapInPandas`` stage with the same output schema
(see operators/encode_udf.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from next_plaid_spark.session import local_df
from next_plaid_spark.functions.text import tokenize_unicode61
from next_plaid_spark.functions.vector import l2_normalize

DEFAULT_DIM = 16
DOC_MAX_TOKENS = 48   # reference document_length default is 300 (lib.rs:635);
QUERY_MAX_TOKENS = 8  # reference query_length default 48 — scaled down for synthetic corpus


def token_vector(token: Column, dim: int = DEFAULT_DIM) -> Column:
    """Deterministic unit vector for a token (ARRAY<DOUBLE>)."""
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.conv(
                F.substring(F.md5(F.concat(token, F.lit(":"), i.cast("string"))), 1, 8),
                16,
                10,
            ).cast("double")
            / F.lit(2147483648.0)
            - F.lit(1.0)
        ),
    )
    return l2_normalize(raw)


def token_vector_sql(token_expr: str, dim: int = DEFAULT_DIM) -> str:
    """DuckDB SQL producing the identical vector (for oracle queries)."""
    return f"""
    list_transform(
      list_transform(range(0, {dim}),
        i -> CAST(concat('0x', substr(md5(concat({token_expr}, ':', CAST(i AS VARCHAR))), 1, 8)) AS BIGINT)
             / 2147483648.0 - 1.0),
      x -> x / sqrt(list_reduce(
             list_transform(list_transform(range(0, {dim}),
               i -> CAST(concat('0x', substr(md5(concat({token_expr}, ':', CAST(i AS VARCHAR))), 1, 8)) AS BIGINT)
                    / 2147483648.0 - 1.0),
               y -> y * y),
             (a, b) -> a + b)))
    """.strip()


def encode_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    dim: int = DEFAULT_DIM,
    max_tokens: int = DOC_MAX_TOKENS,
    out_id: str = "doc_id",
) -> DataFrame:
    """``(id, text)`` → exploded token-embedding DF:
    ``(out_id BIGINT, token_idx INT, token STRING, vec ARRAY<DOUBLE>)``.

    Mirrors the exploded ``doc_tokens`` layout from SURVEY.md §1.1 — the
    scale-preferred representation (one row per token, partitionable).
    """
    toks = F.slice(tokenize_unicode61(F.col(text_col)), 1, max_tokens)
    exploded = (
        df.select(F.col(id_col).cast("long").alias(out_id), toks.alias("_toks"))
        .select(out_id, F.posexplode("_toks").alias("token_idx", "token"))
    )
    # Vectors are a pure function of token text: hash only the distinct
    # vocabulary and broadcast-join it back. Zipfian text makes |vocab| ≪
    # |token rows|, and every downstream DAG branch re-evaluates its encode
    # subtree — vocab-side hashing turns that from O(corpus·dim) md5 calls
    # per branch into O(vocab·dim).
    vocab = (
        exploded.select("token").distinct()
        .withColumn("vec", token_vector(F.col("token"), dim))
    )
    return exploded.join(F.broadcast(vocab), "token").select(
        out_id, "token_idx", "token", "vec"
    )


def encode_documents(documents: DataFrame, *, dim: int = DEFAULT_DIM,
                     max_tokens: int = DOC_MAX_TOKENS) -> DataFrame:
    """documents(doc_id, text, …) → doc_tokens(doc_id, token_idx, token, vec)."""
    return encode_tokens(documents, "doc_id", "text", dim=dim, max_tokens=max_tokens)


def encode_queries(queries: DataFrame, *, dim: int = DEFAULT_DIM,
                   max_tokens: int = QUERY_MAX_TOKENS) -> DataFrame:
    """queries(query_id, text) → query_tokens(query_id, token_idx, token, vec).

    No MASK expansion — synthetic vectors don't benefit; a model-backed
    encoder would add it here (next-plaid-onnx/src/lib.rs:576-590).
    """
    return encode_tokens(
        queries, "query_id", "text", dim=dim, max_tokens=max_tokens, out_id="query_id"
    )


def clustered_token_corpus(spark, *, n_docs: int = 2000,
                           tokens_per_doc: int = 8, dim: int = 16,
                           n_clusters: int = 64, noise: float = 0.25,
                           seed: int = 7, cluster_weights=None):
    """(doc_tokens, doc_cluster): a SELECTIVE synthetic embedding corpus —
    unit-norm token vectors drawn around ``n_clusters`` well-separated
    sphere points, so IVF cells align with clusters and probe width
    genuinely trades recall (the sf* text corpora are deliberately
    tie-heavy and non-selective: every probe width reaches ~every doc, so
    recall curves read 1.0 everywhere and say nothing — this corpus is
    the measurement instrument for the n_ivf_probe sweep the reference
    documents in its README benchmark section).

    ``cluster_weights``: None = uniform cluster popularity; ``"zipf"`` =
    Zipfian (p ∝ 1/rank — hot IVF cells hold most docs, the skew shape
    SURVEY §7 flags); or an explicit probability array.

    Deterministic in ``seed``; returns (DataFrame(doc_id, token_idx, vec),
    DataFrame(doc_id, cluster))."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    if cluster_weights is None:
        doc_cluster = rng.integers(0, n_clusters, n_docs)
    else:
        if isinstance(cluster_weights, str) and cluster_weights == "zipf":
            p = 1.0 / np.arange(1, n_clusters + 1)
        else:
            p = np.asarray(cluster_weights, dtype=np.float64)
        p = p / p.sum()
        doc_cluster = rng.choice(n_clusters, size=n_docs, p=p)
    vecs = (
        centers[np.repeat(doc_cluster, tokens_per_doc)]
        + noise * rng.standard_normal(
            (n_docs * tokens_per_doc, dim)
        ).astype(np.float32)
    )
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [
        (int(d), int(t), vecs[d * tokens_per_doc + t].tolist())
        for d in range(n_docs)
        for t in range(tokens_per_doc)
    ]
    toks = local_df(
        spark, rows, "doc_id long, token_idx int, vec array<float>"
    )
    clusters = local_df(
        spark, [(int(d), int(c)) for d, c in enumerate(doc_cluster)],
        "doc_id long, cluster int",
    )
    return toks, clusters

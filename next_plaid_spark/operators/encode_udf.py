"""Model-backed multi-vector encoder seam (text → token embeddings).

The reference encodes with an ONNX ColBERT session
(next-plaid-onnx/src/lib.rs:700-900): documents get a ``[D] `` prefix and
are truncated to ``document_length`` with punctuation ("skiplist") token
embeddings filtered from the output; queries get a ``[Q] `` prefix and —
when ``do_query_expansion`` is on — are padded to ``query_length`` with
MASK tokens that ARE attended to (lib.rs:1925-1940), so the expansion
positions emit real contextual embeddings (the classic ColBERT query
augmentation, config fields lib.rs:560-614).

Spark-first shape: encoding is a ``mapInPandas`` stage — Arrow batches of
``(id, text)`` in, exploded ``(id, token_idx, vec)`` out. The model is
pluggable: any callable ``(texts: list[str], is_query: bool) ->
list[np.ndarray[num_tokens, dim]]``. Real deployments pass a *factory*
(e.g. one constructing an onnxruntime session) which is instantiated at
most once per executor Python worker and cached under ``model_key`` —
the standard heavyweight-model pattern (workers are reused across tasks).
CI and the oracle harness use :class:`DeterministicFakeColbert`, which
implements the full tokenize→prefix→truncate→expand→skiplist pipeline
with content-hashed unit vectors instead of a neural forward pass.

The output carries NO ``token`` string column — exactly like a real
model, whose embeddings are contextual and not a pure function of the
token text. Downstream (builder, searcher, brute-force MaxSim) all accept
this shape; the vocab-CSE fast paths simply don't engage.
"""

from __future__ import annotations

import hashlib
import math
import re
from dataclasses import dataclass
from typing import Iterable, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Default punctuation skiplist — the reference ships the string-punctuation
# set as skiplist_words (filter_skiplist, lib.rs:600-603).
DEFAULT_SKIPLIST = list("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~")

_TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)


@dataclass(frozen=True)
class EncoderConfig:
    """Public mirror of the reference ColbertConfig (lib.rs:560-614)."""

    query_prefix: str = "[Q]"
    document_prefix: str = "[D]"
    query_length: int = 48
    document_length: int = 300
    do_query_expansion: bool = True
    embedding_dim: int = 128
    mask_token: str = "[MASK]"
    skiplist_words: tuple = tuple(DEFAULT_SKIPLIST)
    do_lower_case: bool = True


class DeterministicFakeColbert:
    """CI stand-in for the ONNX session: same tokenization contract,
    content-hashed unit vectors instead of a forward pass.

    - tokenize: lowercase (config), word/punct split.
    - documents: ``[D]`` prefix, truncate to document_length, skiplist
      tokens dropped from the OUTPUT (reference filters document
      embeddings, not input — lib.rs:600-603).
    - queries: ``[Q]`` prefix, truncate to query_length; with expansion,
      MASK-padded to exactly query_length. MASK vectors vary by position
      (contextual-ish), content vectors depend only on token text.

    Deterministic across processes (md5-seeded), picklable, cheap.
    """

    def __init__(self, config: Optional[EncoderConfig] = None):
        self.config = config or EncoderConfig()

    # -- vector derivation ------------------------------------------------
    def _vec(self, key: str):
        import numpy as np

        dim = self.config.embedding_dim
        out = np.empty(dim, dtype=np.float64)
        for i in range(0, dim, 4):
            h = hashlib.md5(f"{key}:{i}".encode()).digest()
            for j in range(min(4, dim - i)):
                word = int.from_bytes(h[4 * j:4 * j + 4], "big")
                out[i + j] = word / 2147483648.0 - 1.0
        n = math.sqrt(float((out * out).sum()))
        return (out / n) if n > 0 else out

    def _tokenize(self, text: str) -> List[str]:
        if self.config.do_lower_case:
            text = text.lower()
        return _TOKEN_RE.findall(text)

    def __call__(self, texts: List[str], is_query: bool):
        import numpy as np

        cfg = self.config
        skip = set(cfg.skiplist_words)
        out = []
        for text in texts:
            toks = self._tokenize(text)
            if is_query:
                toks = [cfg.query_prefix] + toks[: cfg.query_length - 1]
                if cfg.do_query_expansion:
                    n_mask = cfg.query_length - len(toks)
                    vecs = [self._vec(t) for t in toks] + [
                        self._vec(f"{cfg.mask_token}@{p}")
                        for p in range(n_mask)
                    ]
                else:
                    vecs = [self._vec(t) for t in toks]
            else:
                toks = [cfg.document_prefix] + toks[: cfg.document_length - 1]
                vecs = [self._vec(t) for t in toks if t not in skip]
                if not vecs:  # all-punctuation doc: keep the prefix vector
                    vecs = [self._vec(cfg.document_prefix)]
            out.append(np.stack(vecs))
        return out


# Per-worker model cache: Python workers are reused across tasks
# (spark.python.worker.reuse), so an ONNX/torch session constructed here
# amortizes over the executor's lifetime.
_MODEL_CACHE: dict = {}


def _resolve_model(model, model_key: Optional[str]):
    if model_key is None:
        return model() if _is_factory(model) else model
    got = _MODEL_CACHE.get(model_key)
    if got is None:
        got = model() if _is_factory(model) else model
        _MODEL_CACHE[model_key] = got
    return got


def _is_factory(model) -> bool:
    # A factory is a zero-arg callable producing the model; the model itself
    # is a 2-arg callable (texts, is_query). Distinguish by arity.
    import inspect

    try:
        sig = inspect.signature(model)
    except (TypeError, ValueError):
        return False
    required = [
        p for p in sig.parameters.values()
        if p.default is p.empty and p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
    ]
    return len(required) == 0


def encode_with_model(
    df: DataFrame,
    model,
    *,
    id_col: str,
    text_col: str,
    out_id: str = "doc_id",
    is_query: bool = False,
    batch_size: int = 32,
    model_key: Optional[str] = None,
    vec_type: str = "array<double>",
    pool_factor: Optional[int] = None,
    protected_tokens: int = 1,
) -> DataFrame:
    """``(id, text)`` → ``(out_id BIGINT, token_idx INT, vec ARRAY)``.

    ``model`` is either a ready model (picklable; e.g.
    ``DeterministicFakeColbert``) or a zero-arg factory returning one
    (for non-picklable sessions); with ``model_key`` the constructed
    model is cached per worker process. ``batch_size`` mirrors the
    reference's encoder batching (lib.rs:704-708; 32 CPU / 64 GPU).

    ``pool_factor`` > 1 enables the reference's P6 hierarchical Ward
    pooling of DOCUMENT token matrices inside the same Arrow stage
    (lib.rs:1104-1124 encode→pool wrapper; protected_tokens=1 default,
    lib.rs:1638-1640); queries are never pooled.
    """

    def encode(batches: Iterable):
        import numpy as np
        import pandas as pd

        from next_plaid_spark.operators.pooling import (
            pool_embeddings_hierarchical,
        )

        m = _resolve_model(model, model_key)
        do_pool = bool(pool_factor) and pool_factor > 1 and not is_query
        for pdf in batches:
            if not len(pdf):
                continue
            for start in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[start:start + batch_size]
                mats = m(list(chunk[text_col]), is_query)
                if do_pool:
                    mats = [
                        pool_embeddings_hierarchical(
                            np.asarray(mat), pool_factor, protected_tokens
                        )
                        for mat in mats
                    ]
                ids, idxs, vecs = [], [], []
                for doc_id, mat in zip(chunk[id_col], mats):
                    n = len(mat)
                    ids.extend([doc_id] * n)
                    idxs.extend(range(n))
                    vecs.extend(np.asarray(row) for row in mat)
                yield pd.DataFrame(
                    {out_id: np.asarray(ids, dtype=np.int64),
                     "token_idx": np.asarray(idxs, dtype=np.int32),
                     "vec": vecs}
                )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col)
    ).mapInPandas(encode, schema=f"{out_id} long, token_idx int, vec {vec_type}")


def encode_documents_with_model(
    documents: DataFrame, model, *, model_key: Optional[str] = None,
    batch_size: int = 32, pool_factor: Optional[int] = None,
    protected_tokens: int = 1,
) -> DataFrame:
    """documents(doc_id, text, …) → doc_tokens(doc_id, token_idx, vec),
    optionally Ward-pooled by ``pool_factor`` (P6)."""
    return encode_with_model(
        documents, model, id_col="doc_id", text_col="text",
        out_id="doc_id", is_query=False, batch_size=batch_size,
        model_key=model_key, pool_factor=pool_factor,
        protected_tokens=protected_tokens,
    )


def encode_queries_with_model(
    queries: DataFrame, model, *, model_key: Optional[str] = None,
    batch_size: int = 32,
) -> DataFrame:
    """queries(query_id, text) → query_tokens(query_id, token_idx, vec)."""
    return encode_with_model(
        queries, model, id_col="query_id", text_col="text",
        out_id="query_id", is_query=True, batch_size=batch_size,
        model_key=model_key,
    )

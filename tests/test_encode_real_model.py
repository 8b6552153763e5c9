"""Optional integration: a REAL ColBERT model through the P5/P6 seam.

The CI path uses DeterministicFakeColbert (SURVEY phase 6); this test
proves the same encode_with_model seam carries an actual neural encoder
(the reference's ONNX session, next-plaid-onnx/src/lib.rs:731-1360).
It only runs when SPARK_GRAFT_REAL_ENCODER is set AND a supported backend
imports — neither ships in the CI container, so the default is a skip,
not a fake pass.

  SPARK_GRAFT_REAL_ENCODER=onnx   — onnxruntime + tokenizers, with
      SPARK_GRAFT_ONNX_MODEL=/path/model.onnx
      SPARK_GRAFT_ONNX_TOKENIZER=/path/tokenizer.json
  SPARK_GRAFT_REAL_ENCODER=st     — sentence-transformers ColBERT id in
      SPARK_GRAFT_ST_MODEL (default 'colbert-ir/colbertv2.0')
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

MODE = os.environ.get("SPARK_GRAFT_REAL_ENCODER", "")

pytestmark = pytest.mark.skipif(
    not MODE, reason="SPARK_GRAFT_REAL_ENCODER not set (optional integration)"
)


def _make_factory():
    """Zero-arg factory → callable(texts, is_query) -> [np[n_tok, dim]].

    Returned as a FACTORY (not a model) so the heavyweight session is
    constructed once per executor worker via model_key caching."""
    if MODE == "onnx":
        model_path = os.environ["SPARK_GRAFT_ONNX_MODEL"]
        tok_path = os.environ["SPARK_GRAFT_ONNX_TOKENIZER"]

        def factory():
            import numpy as np
            import onnxruntime as ort
            from tokenizers import Tokenizer

            sess = ort.InferenceSession(model_path)
            tok = Tokenizer.from_file(tok_path)

            def run(texts, is_query):
                prefix = "[Q] " if is_query else "[D] "
                encs = tok.encode_batch([prefix + t for t in texts])
                out = []
                for e in encs:
                    ids = np.asarray([e.ids], dtype=np.int64)
                    mask = np.asarray([e.attention_mask], dtype=np.int64)
                    (emb,) = sess.run(
                        None, {"input_ids": ids, "attention_mask": mask}
                    )
                    out.append(np.asarray(emb[0], dtype=np.float32))
                return out

            return run

        return factory
    if MODE == "st":
        model_id = os.environ.get(
            "SPARK_GRAFT_ST_MODEL", "colbert-ir/colbertv2.0"
        )

        def factory():
            import numpy as np
            import torch
            from transformers import AutoModel, AutoTokenizer

            tok = AutoTokenizer.from_pretrained(model_id)
            mdl = AutoModel.from_pretrained(model_id)
            mdl.eval()

            def run(texts, is_query):
                prefix = "[Q] " if is_query else "[D] "
                batch = tok([prefix + t for t in texts], return_tensors="pt",
                            padding=True, truncation=True, max_length=180)
                with torch.no_grad():
                    hidden = mdl(**batch).last_hidden_state
                out = []
                for i in range(len(texts)):
                    n = int(batch["attention_mask"][i].sum())
                    v = hidden[i, :n].numpy().astype(np.float32)
                    v /= np.maximum(
                        np.linalg.norm(v, axis=1, keepdims=True), 1e-9
                    )
                    out.append(v)
                return out

            return run

        return factory
    pytest.skip(f"unknown SPARK_GRAFT_REAL_ENCODER mode: {MODE!r}")


def test_real_encoder_through_seam(spark):
    try:
        factory = _make_factory()
        factory()  # fail fast if the backend can't load
    except ImportError as e:
        pytest.skip(f"backend not importable: {e}")

    from next_plaid_spark.operators.encode_udf import encode_with_model

    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "spark is a distributed dataframe engine")],
        "doc_id long, text string",
    )
    enc = encode_with_model(
        docs, factory, id_col="doc_id", text_col="text",
        model_key=f"real-{MODE}",
    )
    rows = enc.collect()
    assert rows, "real encoder produced no token embeddings"
    dims = {len(r.vec) for r in rows}
    assert len(dims) == 1, f"inconsistent dims: {dims}"
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {0, 1}

    # pooled variant exercises P6 on real embeddings
    pooled = encode_with_model(
        docs, factory, id_col="doc_id", text_col="text",
        model_key=f"real-{MODE}", pool_factor=2,
    ).collect()
    assert pooled and len(pooled) < len(rows)

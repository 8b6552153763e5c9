"""Multimodal column plumbing — opaque binary payloads + typed metadata,
with Spark-side schema / partitioning / Arrow-batch shapes fully real and
the codec layer STUBBED (image/audio libraries are not in this container).

Contract per BASELINE.json's pipeline extensions: a 100 TB media pipeline
treats assets as ``(asset_id, media_type, content BINARY, meta STRUCT)``
rows; decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so each Python worker sees columnar batches of raw
bytes, never row-at-a-time.

Every stub is deterministic (derived from md5 of the payload) so pipelines
using these operators are testable end-to-end today and swap to PIL /
ffmpeg / torchaudio by replacing ONE function body; raising behavior for a
genuinely absent codec is exercised via ``strict=True``.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, media_type string, content binary, "
    "meta struct<source:string, created_ns:long>"
)

_REAL_CODECS_AVAILABLE = False  # PIL/ffmpeg/torchaudio absent in this env


def synthesize_assets(docs: DataFrame, *, media_type: str = "image") -> DataFrame:
    """Manufacture deterministic binary assets from the documents table
    (testdata has no media column; payload = utf-8 text bytes)."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit(media_type).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.struct(
            F.col("source").alias("source"),
            F.lit(0).cast("long").alias("created_ns"),
        ).alias("meta"),
    )


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, 3


def decode_media(assets: DataFrame, *, strict: bool = False) -> DataFrame:
    """Decode stage: binary → (asset_id, media_type, width, height,
    channels, n_bytes, content_md5). STUB: dimensions derive from the
    payload md5; a real build decodes with PIL/ffmpeg here.

    strict=True raises NotImplementedError (the documented behavior when a
    deployment requires real codecs and none are installed)."""
    if strict and not _REAL_CODECS_AVAILABLE:
        raise NotImplementedError(
            "real media codecs (PIL/ffmpeg) are not installed; "
            "run with strict=False for the deterministic stub decode"
        )

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.content) if r.content is not None else b""
                w, h, c = _fake_dims(payload)
                rows.append(
                    (r.asset_id, r.media_type, w, h, c, len(payload),
                     hashlib.md5(payload).hexdigest())
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "media_type", "width", "height",
                         "channels", "n_bytes", "content_md5"],
            )

    return assets.mapInPandas(
        decode,
        schema="asset_id long, media_type string, width int, height int, "
               "channels int, n_bytes long, content_md5 string",
    )


def extract_features(assets: DataFrame, *, dim: int = 8) -> DataFrame:
    """Feature stage: binary → fixed-dim float vector. STUB: bytes of
    md5(payload) scaled to [0,1) — deterministic, unit-testable, same Arrow
    batch shape a real vision tower would produce."""

    def feats(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.content) if r.content is not None else b""
                h = hashlib.md5(payload).digest()
                v = (np.frombuffer((h * ((dim // 16) + 1))[:dim], dtype=np.uint8)
                     .astype(np.float64) / 256.0)
                rows.append((r.asset_id, v.tolist()))
            yield pd.DataFrame(rows, columns=["asset_id", "feature"])

    return assets.mapInPandas(feats, schema="asset_id long, feature array<double>")


def frame_sample(assets: DataFrame, *, every_n: int = 10,
                 max_frames: int = 4) -> DataFrame:
    """Video frame-sampling stage: one output row per sampled frame with a
    frame index + per-frame payload slice. STUB: slices the byte payload;
    real impl seeks with ffmpeg. Output partitioning (explode) is real."""

    def sample(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.content) if r.content is not None else b""
                n = min(max_frames, max(1, len(payload) // max(every_n, 1)))
                for i in range(n):
                    chunk = payload[i * every_n : (i + 1) * every_n]
                    rows.append((r.asset_id, i, chunk))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx", "frame"])

    return assets.mapInPandas(
        sample, schema="asset_id long, frame_idx int, frame binary"
    )

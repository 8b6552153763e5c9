"""Multimodal column plumbing — opaque binary payloads + typed metadata.

Contract per BASELINE.json's pipeline extensions: a 100 TB media pipeline
treats assets as ``(asset_id, media_type, content BINARY, meta STRUCT)``
rows; decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so each Python worker sees columnar batches of raw
bytes, never row-at-a-time.

Codec layer: REAL pure-stdlib+numpy decoders for the formats that need no
external library —

  - WAV  (stdlib ``wave``): sample rate / channels / sample count, real
    PCM amplitude features
  - PNG  (stdlib ``zlib`` + numpy): full IDAT inflate + per-scanline
    unfilter (filters 0-4) for 8-bit gray/gray+alpha/RGB/RGBA,
    non-interlaced — real pixels, real channel statistics
  - BMP  (manual header + numpy): uncompressed 24/32-bit pixels
  - PPM/PGM (netpbm binary): trivial header + raster

Anything else (JPEG, MP4, …) falls back to a DETERMINISTIC stub (derived
from md5 of the payload) so pipelines stay testable end-to-end; a real
deployment swaps the fallback for PIL/ffmpeg in ONE function.
``strict=True`` raises for unrecognized payloads instead (the documented
behavior when a deployment requires real codecs).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id long, media_type string, content binary, "
    "meta struct<source:string, created_ns:long>"
)

DECODE_SCHEMA = (
    "asset_id long, media_type string, codec string, width int, height int, "
    "channels int, sample_rate int, n_samples long, n_bytes long, "
    "content_md5 string"
)


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


# -- real decoders (stdlib + numpy only) -----------------------------------

def decode_wav(payload: bytes):
    """(sample_rate, n_samples, n_channels, samples[n, ch] float64 in
    [-1, 1]) for PCM WAV via the stdlib ``wave`` module."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch, sw, sr, ns = (w.getnchannels(), w.getsampwidth(),
                           w.getframerate(), w.getnframes())
        raw = w.readframes(ns)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    return sr, ns, nch, x.reshape(-1, nch)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, rgb, gray+a, rgba


def decode_png(payload: bytes):
    """(height, width, channels, pixels uint8 [h, w, c]) for 8-bit
    non-interlaced PNG: zlib-inflate the IDAT stream and undo the per-
    scanline filters (spec §9: None/Sub/Up/Average/Paeth)."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(payload):
        (length,), typ = struct.unpack(">I", payload[pos:pos + 4]), payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if typ == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
                raise ValueError("unsupported PNG variant")
            meta = (h, w, _PNG_CHANNELS[color])
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
        pos += 12 + length
    if meta is None:
        raise ValueError("PNG missing IHDR")
    h, w, c = meta
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * c
    raw = raw.reshape(h, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    for y in range(h):
        line = lines[y].copy()
        prior = out[y - 1] if y else np.zeros(stride, dtype=np.int32)
        f = filters[y]
        if f == 0:
            out[y] = line
        elif f == 1:      # Sub — sequential in x (carried dependency on
            for x in range(stride):  # the RECONSTRUCTED left neighbor)
                line[x] = (line[x] + (line[x - c] if x >= c else 0)) & 0xFF
            out[y] = line
        elif f == 2:      # Up — vectorized
            out[y] = (line + prior) & 0xFF
        elif f == 3:      # Average
            for x in range(stride):
                a = line[x - c] if x >= c else 0
                line[x] = (line[x] + ((a + prior[x]) >> 1)) & 0xFF
            out[y] = line
        elif f == 4:      # Paeth
            for x in range(stride):
                a = line[x - c] if x >= c else 0
                b = prior[x]
                cc = prior[x - c] if x >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                line[x] = (line[x] + pred) & 0xFF
            out[y] = line
        else:
            raise ValueError(f"bad PNG filter {f}")
    return h, w, c, out.astype(np.uint8).reshape(h, w, c)


def decode_bmp(payload: bytes):
    """(height, width, channels, pixels uint8 [h, w, c]) for uncompressed
    24/32-bit BITMAPINFOHEADER BMPs (rows bottom-up, 4-byte padded)."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    pix_off = struct.unpack("<I", payload[10:14])[0]
    w, h = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    comp = struct.unpack("<I", payload[30:34])[0]
    if bpp not in (24, 32) or comp != 0:
        raise ValueError("unsupported BMP variant")
    c = bpp // 8
    flip = h > 0
    h = abs(h)
    row_bytes = (w * c + 3) & ~3
    raw = np.frombuffer(payload, dtype=np.uint8,
                        count=row_bytes * h, offset=pix_off)
    px = raw.reshape(h, row_bytes)[:, : w * c].reshape(h, w, c)
    if flip:
        px = px[::-1]
    # BGR(A) → RGB(A)
    px = px[:, :, [2, 1, 0] + ([3] if c == 4 else [])]
    return h, w, c, np.ascontiguousarray(px)


def decode_ppm(payload: bytes):
    """(height, width, channels, pixels) for binary netpbm P5 (gray) /
    P6 (RGB), maxval 255."""
    import numpy as np

    if payload[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary PGM/PPM")
    c = 3 if payload[:2] == b"P6" else 1
    # header: magic, width, height, maxval — whitespace/comment separated
    fields, i = [], 2
    while len(fields) < 3:
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            while i < len(payload) and payload[i:i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("unsupported netpbm maxval")
    px = np.frombuffer(payload, dtype=np.uint8, count=h * w * c, offset=i)
    return h, w, c, px.reshape(h, w, c)


def _sniff(payload: bytes) -> str | None:
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:2] == b"BM" and len(payload) > 34:
        return "bmp"
    if payload[:2] in (b"P5", b"P6"):
        return "ppm"
    return None


def _fake_dims(payload: bytes) -> tuple[int, int, int]:
    h = hashlib.md5(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, 3


def decode_media(assets: DataFrame, *, strict: bool = False) -> DataFrame:
    """Decode stage: binary → (…, codec, width, height, channels,
    sample_rate, n_samples, n_bytes, content_md5). Real decode for
    WAV/PNG/BMP/PPM payloads (see module docstring); anything else uses
    the deterministic md5 stub (codec='stub'), or raises when
    ``strict=True``. Audio rows carry (sample_rate, n_samples,
    channels); image rows carry (width, height, channels)."""

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.content) if r.content is not None else b""
                kind = _sniff(payload)
                width = height = sr = ns = None
                if kind == "wav":
                    sr, ns, ch, _ = decode_wav(payload)
                elif kind == "png":
                    height, width, ch, _ = decode_png(payload)
                elif kind == "bmp":
                    height, width, ch, _ = decode_bmp(payload)
                elif kind == "ppm":
                    height, width, ch, _ = decode_ppm(payload)
                elif strict:
                    raise NotImplementedError(
                        f"no codec for payload of asset {r.asset_id} "
                        "(JPEG/MP4/… need PIL/ffmpeg); strict=False uses "
                        "the deterministic stub"
                    )
                else:
                    kind = "stub"
                    width, height, ch = _fake_dims(payload)
                rows.append(
                    (r.asset_id, r.media_type, kind, width, height, ch,
                     sr, ns, len(payload),
                     hashlib.md5(payload).hexdigest())
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "media_type", "codec", "width",
                         "height", "channels", "sample_rate", "n_samples",
                         "n_bytes", "content_md5"],
            )

    return assets.mapInPandas(decode, schema=DECODE_SCHEMA)


def extract_features(assets: DataFrame, *, dim: int = 8) -> DataFrame:
    """Feature stage: binary → fixed-dim float vector.

    REAL statistics for decodable payloads — images: per-channel means +
    a coarse 2×2 luminance grid; audio: RMS + mean/min/max amplitude +
    per-quarter RMS profile — padded/truncated to ``dim``. Undecodable
    payloads get the deterministic md5 stub vector (same Arrow batch
    shape a real vision/audio tower would produce)."""

    def feats(batches):
        import numpy as np
        import pandas as pd

        def img_vec(px):
            x = px.astype(np.float64) / 255.0
            h, w, _ = x.shape
            lum = x.mean(axis=2)
            grid = [
                lum[:h // 2 or 1, :w // 2 or 1].mean(),
                lum[:h // 2 or 1, w // 2:].mean() if w > 1 else 0.0,
                lum[h // 2:, :w // 2 or 1].mean() if h > 1 else 0.0,
                lum[h // 2:, w // 2:].mean() if h > 1 and w > 1 else 0.0,
            ]
            return np.asarray(list(x.mean(axis=(0, 1))) + grid)

        def wav_vec(x):
            mono = x.mean(axis=1) if x.size else np.zeros(1)
            q = max(1, len(mono) // 4)
            quarters = [
                float(np.sqrt(np.mean(mono[i * q:(i + 1) * q] ** 2)))
                if len(mono[i * q:(i + 1) * q]) else 0.0
                for i in range(4)
            ]
            return np.asarray(
                [float(np.sqrt(np.mean(mono ** 2))), float(mono.mean()),
                 float(mono.min(initial=0.0)), float(mono.max(initial=0.0))]
                + quarters
            )

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.content) if r.content is not None else b""
                kind = _sniff(payload)
                try:
                    if kind == "wav":
                        _, _, _, x = decode_wav(payload)
                        v = wav_vec(x)
                    elif kind in ("png", "bmp", "ppm"):
                        _, _, _, px = {
                            "png": decode_png, "bmp": decode_bmp,
                            "ppm": decode_ppm,
                        }[kind](payload)
                        v = img_vec(px)
                    else:
                        raise ValueError
                except ValueError:
                    h = hashlib.md5(payload).digest()
                    v = (np.frombuffer(
                        (h * ((dim // 16) + 1))[:dim], dtype=np.uint8)
                        .astype(np.float64) / 256.0)
                v = np.pad(v, (0, max(0, dim - len(v))))[:dim]
                rows.append((r.asset_id, v.tolist()))
            yield pd.DataFrame(rows, columns=["asset_id", "feature"])

    return assets.mapInPandas(feats, schema="asset_id long, feature array<double>")


def frame_sample(assets: DataFrame, *, every_n: int = 10,
                 max_frames: int = 4) -> DataFrame:
    """Video frame-sampling stage: one output row per sampled frame with a
    frame index + per-frame payload slice. STUB: slices the byte payload
    (real video needs ffmpeg, not in this container); the output
    partitioning (explode) is real."""

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

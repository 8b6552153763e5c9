"""Colgrep ranking boosts, standalone rerank, multimodal plumbing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from next_plaid_spark.operators.colgrep import (
    PENALTY_TEST,
    apply_ranking,
    build_embedding_text,
    split_identifier,
    tokenize_identifiers,
)
from next_plaid_spark.operators.multimodal import (
    decode_media,
    extract_features,
    frame_sample,
    synthesize_assets,
)
from next_plaid_spark.operators.rerank import rerank

UNITS_SCHEMA = (
    "unit_id long, name string, file string, unit_type string, line int, "
    "end_line int, signature string, docstring string, parent_class string, "
    "calls array<string>, code string"
)


def test_split_identifier():
    assert split_identifier("getHTTPResponse_code") == ["get", "http", "response", "code"]
    assert split_identifier("snake_case_name") == ["snake", "case", "name"]
    assert split_identifier("simpleword") == ["simpleword"]
    assert split_identifier("XMLHttpRequest") == ["xml", "http", "request"]


def test_tokenize_identifiers_compound_and_bigrams():
    toks = tokenize_identifiers("getUserName")
    assert "getusername" in toks          # compound/lowered
    assert {"get", "user", "name"} <= set(toks)
    assert "getuser" in toks and "username" in toks  # bigrams


@pytest.fixture()
def units(spark):
    rows = [
        (0, "parse_config", "src/config.py", "Function", 10, 40, "def parse_config(path)",
         "Parse the config file", None, ["open", "json_load"], "def parse_config(path):..."),
        (1, "helper", "tests/test_config.py", "Function", 5, 20, None, None, None, [], "def helper():..."),
        (2, "ConfigLoader", "src/loader.py", "Class", 1, 80, None, "Loads config", None, [], "class ConfigLoader:..."),
        (3, "misc", "src/loader.py", "Function", 90, 110, None, None, None, [], "def misc():..."),
    ]
    return spark.createDataFrame(rows, UNITS_SCHEMA)


def test_ranking_penalizes_tests_boosts_definitions(spark, units):
    results = spark.createDataFrame(
        [(0, 1.0), (1, 1.0), (2, 1.0), (3, 1.0)], "unit_id long, score double"
    )
    out = apply_ranking(results, units, "parse config", top_k=10, collapse=False)
    by_id = {r.unit_id: r.score for r in out.collect()}
    # test-file unit penalized to ≈0.30 base before boosts; no def/stem boost
    # ('helper' name, 'test_config' stem does match 'config'... prefix) —
    # just assert ordering: real source units beat the test unit
    assert by_id[0] > by_id[1] and by_id[2] > by_id[1]
    # definition + stem boosts: parse_config (name match, config stem) on top
    ranks = {r.unit_id: r.rank for r in out.collect()}
    assert ranks[0] == 1


def test_collapse_by_file_merges_ranges(spark, units):
    results = spark.createDataFrame(
        [(2, 2.0), (3, 1.5)], "unit_id long, score double"
    )
    out = apply_ranking(results, units, "loader", top_k=10, collapse=True).collect()
    files = [r.file for r in out]
    assert files.count("src/loader.py") == 1
    row = [r for r in out if r.file == "src/loader.py"][0]
    assert row.line == 1 and row.end_line == 110  # merged range


def test_embedding_text_structure(spark, units):
    out = build_embedding_text(units).collect()
    t = [r.embed_text for r in out if r.unit_id == 0][0]
    assert t.startswith("Function: parse_config")
    assert "Signature: def parse_config(path)" in t
    # path shortened + normalized for embedding (embed.rs:14-82): words
    # split, lowercased, raw filename appended
    assert "File: src config config.py" in t
    assert t.index("File:") < t.index("Code:")


def test_rerank_with_explicit_pairs(spark):
    dt = spark.createDataFrame(
        [(0, 0, "a", [1.0, 0.0]), (1, 0, "b", [0.0, 1.0])],
        "doc_id long, token_idx int, token string, vec array<double>",
    )
    qt = spark.createDataFrame(
        [(7, 0, "q", [1.0, 0.0])],
        "query_id long, token_idx int, token string, vec array<double>",
    )
    pairs = spark.createDataFrame([(7, 0), (7, 1)], "query_id long, doc_id long")
    out = rerank(qt, dt, pairs).collect()
    scores = {r.doc_id: (r.score, r.rank) for r in out}
    assert math.isclose(scores[0][0], 1.0) and scores[0][1] == 1
    assert math.isclose(scores[1][0], 0.0) and scores[1][1] == 2


def test_multimodal_pipeline_shapes(spark, documents):
    assets = synthesize_assets(documents.limit(20))
    decoded = decode_media(assets).collect()
    assert len(decoded) == 20
    for r in decoded:
        assert 64 <= r.width < 256 and r.channels == 3 and r.n_bytes > 0
    feats = extract_features(assets, dim=8).collect()
    assert all(len(r.feature) == 8 for r in feats)
    assert all(0.0 <= v < 1.0 for r in feats for v in r.feature)
    frames = frame_sample(assets, every_n=10, max_frames=4).collect()
    assert {r.asset_id for r in frames} == {r.asset_id for r in decoded}
    assert all(r.frame_idx < 4 for r in frames)


def test_multimodal_strict_raises(spark, documents):
    # text payloads carry no known magic bytes → strict mode raises at
    # execution (inside the decode worker, surfaced as a PythonException)
    with pytest.raises(Exception, match="codec"):
        decode_media(
            synthesize_assets(documents.limit(1)), strict=True
        ).collect()


def _make_wav(sr=8000, freq=440.0, n=800, ch=1):
    import io
    import math
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(sr)
        frames = b"".join(
            struct.pack("<" + "h" * ch,
                        *([int(12000 * math.sin(2 * math.pi * freq * i / sr))] * ch))
            for i in range(n)
        )
        w.writeframes(frames)
    return buf.getvalue()


def _make_png(px, filters=None):
    """Minimal PNG writer (8-bit RGB/gray, non-interlaced) applying the
    requested filter type per row — exercises every unfilter branch."""
    import struct
    import zlib

    import numpy as np

    h, w, c = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    filters = filters or [0] * h
    stride = w * c
    flat = px.astype(np.int32).reshape(h, stride)
    raw = bytearray()
    for y in range(h):
        f = filters[y]
        line = flat[y].copy()
        prior = flat[y - 1] if y else np.zeros(stride, dtype=np.int32)
        enc = line.copy()
        for x in range(stride):
            a = line[x - c] if x >= c else 0
            b = prior[x]
            cc = prior[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            enc[x] = (line[x] - pred) & 0xFF
        raw.append(f)
        raw.extend(int(v) for v in enc)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def _make_bmp(px):
    """24-bit bottom-up BMP from an [h, w, 3] RGB array."""
    import struct

    h, w, _ = px.shape
    row = (w * 3 + 3) & ~3
    pad = row - w * 3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        for x in range(w):
            r, g, b = px[y, x]
            body.extend((int(b), int(g), int(r)))
        body.extend(b"\x00" * pad)
    off = 54
    return (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                          0, 0, 0, 0)
            + bytes(body))


def test_real_wav_decode_roundtrip():
    from next_plaid_spark.operators.multimodal import decode_wav

    payload = _make_wav(sr=8000, n=800, ch=2)
    sr, ns, ch, x = decode_wav(payload)
    assert (sr, ns, ch) == (8000, 800, 2)
    assert x.shape == (800, 2)
    # a 440 Hz tone at 12000/32768 amplitude has RMS ≈ amp/√2
    import numpy as np
    rms = float(np.sqrt(np.mean(x[:, 0] ** 2)))
    assert abs(rms - (12000 / 32768) / np.sqrt(2)) < 0.01


def test_real_png_decode_all_filters():
    import numpy as np

    from next_plaid_spark.operators.multimodal import decode_png

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    payload = _make_png(px, filters=[0, 1, 2, 3, 4])
    h, w, c, got = decode_png(payload)
    assert (h, w, c) == (5, 7, 3)
    assert np.array_equal(got, px)


def test_real_bmp_decode_roundtrip():
    import numpy as np

    from next_plaid_spark.operators.multimodal import decode_bmp

    rng = np.random.default_rng(6)
    px = rng.integers(0, 256, (4, 5, 3), dtype=np.uint8)
    h, w, c, got = decode_bmp(_make_bmp(px))
    assert (h, w, c) == (4, 5, 3)
    assert np.array_equal(got, px)


def test_real_ppm_decode_roundtrip():
    import numpy as np

    from next_plaid_spark.operators.multimodal import decode_ppm

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (3, 4, 3), dtype=np.uint8)
    payload = b"P6\n# comment\n4 3\n255\n" + px.tobytes()
    h, w, c, got = decode_ppm(payload)
    assert (h, w, c) == (3, 4, 3)
    assert np.array_equal(got, px)


def test_decode_media_routes_real_and_stub(spark):
    """decode_media: real codecs fire on magic bytes, stub otherwise, and
    feature extraction computes REAL channel means for decodable images."""
    import numpy as np

    from next_plaid_spark.operators.multimodal import (
        decode_media, extract_features)

    px = np.zeros((4, 4, 3), dtype=np.uint8)
    px[:, :, 0] = 255  # pure red
    wav = _make_wav(sr=8000, n=400, ch=1)
    assets = spark.createDataFrame(
        [
            (0, "image", bytearray(_make_png(px)), ("t", 0)),
            (1, "image", bytearray(_make_bmp(px)), ("t", 0)),
            (2, "audio", bytearray(wav), ("t", 0)),
            (3, "image", bytearray(b"just some text"), ("t", 0)),
        ],
        "asset_id long, media_type string, content binary, "
        "meta struct<source:string, created_ns:long>",
    )
    got = {r.asset_id: r for r in decode_media(assets).collect()}
    assert got[0].codec == "png" and (got[0].width, got[0].height) == (4, 4)
    assert got[1].codec == "bmp" and got[1].channels == 3
    assert got[2].codec == "wav" and got[2].sample_rate == 8000
    assert got[2].n_samples == 400 and got[2].channels == 1
    assert got[3].codec == "stub" and got[3].width is not None

    feats = {r.asset_id: r.feature for r in extract_features(assets).collect()}
    # pure-red image: mean R channel = 1.0, G/B = 0.0
    assert abs(feats[0][0] - 1.0) < 1e-9 and abs(feats[0][1]) < 1e-9
    assert feats[0][:4] == feats[1][:4]  # png and bmp agree on the pixels
    # audio RMS of the tone ≈ amp/√2
    assert abs(feats[2][0] - (12000 / 32768) / 2 ** 0.5) < 0.01


def test_decode_media_strict_raises_on_unknown_only(spark):
    import pytest as _pytest

    from next_plaid_spark.operators.multimodal import decode_media

    wav_assets = spark.createDataFrame(
        [(0, "audio", bytearray(_make_wav()), ("t", 0))],
        "asset_id long, media_type string, content binary, "
        "meta struct<source:string, created_ns:long>",
    )
    assert decode_media(wav_assets, strict=True).count() == 1  # real codec ok

    bad = spark.createDataFrame(
        [(1, "video", bytearray(b"\x00\x01mp4?"), ("t", 0))],
        "asset_id long, media_type string, content binary, "
        "meta struct<source:string, created_ns:long>",
    )
    with _pytest.raises(Exception):
        decode_media(bad, strict=True).count()

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
    assert "File: src/config.py" in t
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
    with pytest.raises(NotImplementedError):
        decode_media(synthesize_assets(documents.limit(1)), strict=True)

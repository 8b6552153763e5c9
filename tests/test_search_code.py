"""End-to-end code search (the colgrep CLI pipeline) + change detection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from next_plaid_spark.operators.colgrep import detect_changes, search_code

UNITS_SCHEMA = (
    "unit_id long, name string, file string, unit_type string, line int, "
    "end_line int, signature string, docstring string, parent_class string, "
    "calls array<string>, code string"
)


@pytest.fixture(scope="module")
def units(spark):
    rows = [
        (0, "parse_config", "src/config.py", "Function", 10, 40,
         "def parse_config(path)", "Parse the configuration file into a dict",
         None, ["open"], "def parse_config(path):\n    data = open(path).read()"),
        (1, "write_config", "src/config.py", "Function", 50, 70,
         "def write_config(cfg)", "Serialize configuration", None, [],
         "def write_config(cfg):\n    json.dump(cfg)"),
        (2, "HttpClient", "src/http/client.py", "Class", 1, 120,
         None, "Async http client with retries", None, ["request"],
         "class HttpClient:\n    def request(self):\n        pass"),
        (3, "test_parse", "tests/test_config.py", "Function", 5, 25,
         None, None, None, ["parse_config"], "def test_parse():\n    parse_config('x')"),
        (4, "retry_request", "src/http/retry.py", "Function", 8, 30,
         "def retry_request(fn, n)", "Retry helper with backoff", None, [],
         "def retry_request(fn, n):\n    for i in range(n): fn()"),
    ]
    return spark.createDataFrame(rows, UNITS_SCHEMA).cache()


def test_search_code_finds_relevant_unit(spark, units):
    out = search_code(units, "parse configuration file", top_k=3).collect()
    assert out, "non-empty results"
    assert out[0].file == "src/config.py"
    assert out[0].rank == 1


def test_search_code_regex_prefilter(spark, units):
    out = search_code(units, "config", regex=r"json\.dump", top_k=5,
                      collapse=False).collect()
    assert [r.unit_id for r in out] == [1]


def test_search_code_globs(spark, units):
    out = search_code(units, "http retry", include_glob="src/http/*",
                      top_k=5, collapse=False).collect()
    assert {r.unit_id for r in out} <= {2, 4}
    out2 = search_code(units, "config", exclude_glob="tests/*", top_k=10,
                       collapse=False).collect()
    assert all(not r.file.startswith("tests/") for r in out2)


def test_search_code_empty_prefilter(spark, units):
    out = search_code(units, "anything", regex="zzz_no_match_zzz").collect()
    assert out == []


def test_detect_changes(spark):
    old = spark.createDataFrame(
        [("a.py", "h1", 10), ("b.py", "h2", 20), ("c.py", "h3", 30)],
        "path string, content_hash string, size long",
    )
    new = spark.createDataFrame(
        [("a.py", "h1", 10), ("b.py", "h2x", 21), ("d.py", "h4", 5)],
        "path string, content_hash string, size long",
    )
    got = {(r.path, r.change) for r in detect_changes(old, new).collect()}
    assert got == {("d.py", "added"), ("c.py", "removed"), ("b.py", "modified")}


def test_identifier_tokens_catalyst_matches_python(spark):
    """The Catalyst column tokenizer must reproduce tokenize_identifiers
    exactly (tokens AND order) — it replaced the row-at-a-time UDF."""
    from next_plaid_spark.operators.colgrep import (
        identifier_tokens,
        tokenize_identifiers,
    )

    samples = [
        "getHTTPResponse_code", "parse_config", "userName userID",
        "HTMLParser", "snake_case_id", "x", "", "a_b", "ABCdef",
        "foo2Bar baz__qux", "UPPER lower MixedCase99", "with-dash.dots",
        None, "_leading trailing_", "get_user plus getuser",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    got = df.select(
        F.col("text"), identifier_tokens(F.col("text")).alias("toks")
    ).collect()
    for r in got:
        assert list(r.toks) == tokenize_identifiers(r.text), r.text


def test_no_python_udf_in_package():
    """K1 gate: no row-at-a-time F.udf anywhere in next_plaid_spark."""
    import pathlib

    pkg = pathlib.Path("next_plaid_spark")
    hits = [
        str(p)
        for p in pkg.rglob("*.py")
        if "F.udf(" in p.read_text() or "functions.udf(" in p.read_text()
    ]
    assert hits == []


def test_apply_ranking_single_job(spark, units):
    """The ranking pass must not launch driver collects mid-plan: building
    the ranked DataFrame triggers zero Spark jobs until an action runs."""
    from next_plaid_spark.operators.colgrep import apply_ranking

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    results = units.select(F.col("unit_id"), F.lit(1.0).alias("score"))
    ranked = apply_ranking(results, units, "parse config", top_k=5)
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before  # plan construction is lazy, no hidden jobs
    assert ranked.count() > 0


def test_search_code_over_new_language_surface(spark):
    """End-to-end search_code across the r6 language surface: R and QML
    code units plus typed text/config Documents are all indexable and
    retrievable, with reference-matching language labels flowing through
    to ranking and glob filters."""
    from next_plaid_spark.operators.code_parse import (
        parse_code_units, with_unit_ids)
    from next_plaid_spark.operators.colgrep import search_code

    files = spark.createDataFrame(
        [
            ("stats.r",
             "# Computes the weighted harmonic mean of samples\n"
             "harmonic_mean <- function(x, w) {\n"
             "    sum(w) / sum(w / x)\n"
             "}\n"),
            ("shell.qml",
             "import QtQuick\n\nPanelWindow {\n    id: root\n"
             "    function toggleOverlay(visible) {\n"
             "        overlay.visible = visible;\n    }\n}\n"),
            ("docs/deploy.md",
             "# Deploying the analytics service\n\n"
             "Run terraform apply and then restart the ingest workers.\n"),
            ("conf/app.yaml",
             "ingest:\n  workers: 8\n  queue: analytics\n"),
            ("main.py",
             "def unrelated():\n    return 42\n"),
        ],
        "path string, content string",
    )
    units = with_unit_ids(parse_code_units(files))

    langs = {r.file: r.language for r in units.collect()}
    assert langs["stats.r"] == "r" and langs["shell.qml"] == "qml"
    assert langs["docs/deploy.md"] == "markdown"
    assert langs["conf/app.yaml"] == "yaml"

    got = search_code(units, "harmonic mean of samples", top_k=3).collect()
    assert got and got[0].file == "stats.r"

    got = search_code(units, "toggle overlay visible", top_k=3).collect()
    assert got and got[0].file == "shell.qml"

    got = search_code(units, "deploying analytics service", top_k=3,
                      include_glob="*.md").collect()
    assert got and got[0].file == "docs/deploy.md"

    got = search_code(units, "ingest workers queue", top_k=3,
                      include_glob="conf/*").collect()
    assert got and got[0].file == "conf/app.yaml"

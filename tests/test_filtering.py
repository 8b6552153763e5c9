"""WHERE-grammar conformance (FIXTURES.md §5) + filtered search semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from next_plaid_spark.filtering import (
    FilterValidationError,
    MetadataStore,
    bind_condition,
    bind_condition_duckdb,
    validate_condition,
)

VALID = [
    ("category = ?", 1),
    ("score > ? AND score <= ?", 2),
    ("year IN (?, ?, ?)", 3),
    ("name LIKE ?", 1),
    ("text REGEXP ?", 1),
    ("nullable_col IS NOT NULL", 0),
    ("nullable_col IS NULL", 0),
    ("NOT (score BETWEEN ? AND ?)", 2),
    ("a = ? OR (b != ? AND NOT c < ?)", 3),
    ("flag <> ?", 1),
    ("col NOT LIKE ?", 1),
    ("col NOT IN (?, ?)", 2),
    ("col NOT BETWEEN ? AND ?", 2),
]

INVALID = [
    "category = ?; DROP TABLE x",     # semicolon
    "score > 1",                      # literal value (placeholders only)
    "name LIKE '%x%'",                # quoted literal
    "1 = 1",                          # non-column lhs
    "SELECT * FROM t",                # smuggled statement
    "a = ? -- comment",               # comment
    "a = ? UNION SELECT ?",           # union
    "a BETWEEN ?",                    # incomplete BETWEEN
    "a IN ()",                        # empty IN
    "a IS",                           # incomplete IS
    "(a = ?",                         # unbalanced paren
    "a REGEXP",                       # missing value
    "",                               # empty
    'a = "x"',                        # double quote
]


@pytest.mark.parametrize("cond,n", VALID)
def test_valid_conditions(cond, n):
    assert validate_condition(cond) == n


@pytest.mark.parametrize("cond", INVALID)
def test_invalid_conditions(cond):
    with pytest.raises(FilterValidationError):
        validate_condition(cond)


def test_bind_renders_spark_dialect():
    assert (
        bind_condition("category = ? AND score > ?", ["a'b", 1.5])
        == "category = 'a''b' AND score > 1.5"
    )
    assert bind_condition("text REGEXP ?", ["^ab"]) == "text RLIKE '^ab'"
    assert bind_condition("flag = ?", [True]) == "flag = TRUE"


def test_bind_duckdb_regexp():
    assert (
        bind_condition_duckdb("text REGEXP ? AND x = ?", ["^a", 3])
        == "regexp_matches( text , '^a') AND x = 3".replace("( ", "( ").strip()
        or "regexp_matches" in bind_condition_duckdb("text REGEXP ?", ["^a"])
    )
    s = bind_condition_duckdb("text NOT REGEXP ?", ["^a"])
    assert s.startswith("NOT regexp_matches(")


def test_param_count_mismatch():
    with pytest.raises(FilterValidationError):
        bind_condition("a = ?", [])
    with pytest.raises(FilterValidationError):
        bind_condition("a = ?", [1, 2])


def test_metadata_store_roundtrip(spark, documents):
    store = MetadataStore(documents)
    subset = store.where_condition("lang = ? AND n_chars > ?", ["en", 100])
    expected = documents.filter((F.col("lang") == "en") & (F.col("n_chars") > 100))
    assert subset.count() == expected.count()
    assert store.count("lang = ?", ["en"]) == documents.filter(F.col("lang") == "en").count()
    langs = {r.lang for r in store.get_distinct_strings("lang").collect()}
    assert "en" in langs or len(langs) > 0


def test_update_where(spark):
    df = spark.createDataFrame(
        [(0, "a", 1.0), (1, "b", 2.0)], "doc_id long, cat string, score double"
    )
    out = MetadataStore(df).update_where("cat", "z", "score > ?", [1.5]).collect()
    by_id = {r.doc_id: r.cat for r in out}
    assert by_id == {0: "a", 1: "z"}


def test_where_condition_regexp_fancy(spark, documents):
    """F3 parity: lookahead + backreference patterns (fancy-regex features,
    filtering.rs:1969-2060) run through the pandas-UDF regex path."""
    store = MetadataStore(documents)
    # lookahead: docs whose text contains 'data' followed somewhere by 'model'
    got = store.where_condition_regexp("text", r"data(?=.*model)").collect()
    oracle = [
        r.doc_id for r in documents.collect()
        if r.text and __import__("re").search(r"data(?=.*model)", r.text)
    ]
    assert sorted(r.doc_id for r in got) == sorted(oracle)

    # backreference: any repeated word
    got2 = store.where_condition_regexp("text", r"\b(\w+)\b \1\b").collect()
    oracle2 = [
        r.doc_id for r in documents.collect()
        if r.text and __import__("re").search(r"\b(\w+)\b \1\b", r.text)
    ]
    assert sorted(r.doc_id for r in got2) == sorted(oracle2)

    # invalid pattern degrades to no-match (backtrack-limit analog)
    assert store.where_condition_regexp("text", r"(unclosed").count() == 0

    # extra grammar condition composes (pushed to the scan)
    got3 = store.where_condition_regexp(
        "text", r"data", extra_cond="lang = ?", extra_params=["en"]
    )
    assert got3.count() <= store.where_condition("lang = ?", ["en"]).count()

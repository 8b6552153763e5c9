"""URL filtering (operators/webfilter.py): normalization, suffix-exact
blocklist semantics, URL dedup determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from next_plaid_spark.operators.webfilter import (
    dedup_by_url,
    domain_of,
    filter_by_domain_blocklist,
    normalize_url,
)

URLS = [
    (1, "https://WWW.Example.com/a/b#frag", "x"),
    (2, "http://example.com/a/b/", "y"),           # same canon as 1
    (3, "https://sub.bad.com/page?q=1", "z"),      # blocked via suffix
    (4, "https://bad.com", "w"),                   # blocked exactly
    (5, "https://notbad.com/ok", "v"),             # NOT blocked
    (6, "ftp://files.example.org:8080/data", "u"),
]
SCHEMA = "doc_id long, url string, text string"


def test_normalize_and_domain(spark):
    df = spark.createDataFrame(URLS, SCHEMA).select(
        "doc_id",
        normalize_url(F.col("url")).alias("canon"),
        domain_of(F.col("url")).alias("dom"),
    )
    got = {r.doc_id: (r.canon, r.dom) for r in df.collect()}
    assert got[1] == ("example.com/a/b", "example.com")
    assert got[2] == ("example.com/a/b", "example.com")
    assert got[3][1] == "sub.bad.com"
    assert got[6] == ("files.example.org:8080/data", "files.example.org")


def test_blocklist_suffix_semantics(spark):
    docs = spark.createDataFrame(URLS, SCHEMA)
    kept = filter_by_domain_blocklist(docs, ["bad.com"])
    ids = sorted(r.doc_id for r in kept.collect())
    # 3 (subdomain) and 4 (exact) blocked; 5 (notbad.com) survives the
    # label boundary
    assert ids == [1, 2, 5, 6]
    # DataFrame-shaped blocklist behaves identically
    bl = spark.createDataFrame([("bad.com",)], "domain string")
    assert sorted(r.doc_id for r in
                  filter_by_domain_blocklist(docs, bl).collect()) == ids


def test_dedup_by_url_first_wins(spark):
    docs = spark.createDataFrame(URLS, SCHEMA)
    kept = dedup_by_url(docs)
    ids = sorted(r.doc_id for r in kept.collect())
    assert ids == [1, 3, 4, 5, 6]  # doc 2 collapses into doc 1's canon
    assert kept.columns == ["doc_id", "url", "text"]  # schema unchanged


def test_no_python_udf_in_plans(spark):
    """The whole module must stay Catalyst-side (no BatchEvalPython)."""
    docs = spark.createDataFrame(URLS, SCHEMA)
    for df in (filter_by_domain_blocklist(docs, ["bad.com"]),
               dedup_by_url(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "PythonUDF" not in plan

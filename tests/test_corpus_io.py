"""JSONL corpus IO: round trip, id assignment, metadata preservation,
and end-to-end use through an engine operator."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from next_plaid_spark.sources.corpus_io import (
    load_documents_jsonl,
    write_documents_jsonl,
)


@pytest.fixture()
def jsonl_path(tmp_path):
    rows = [
        {"text": "alpha beta gamma", "url": "http://a", "lang": "en",
         "meta": {"stars": 3}},
        {"text": "delta epsilon", "url": "http://b", "lang": "de",
         "meta": {"stars": 1}},
        {"text": "alpha beta gamma", "url": "http://c", "lang": "en",
         "meta": {"stars": 9}},  # exact duplicate text of row 0
        {"text": "zeta", "url": "http://d", "lang": "en",
         "meta": {"stars": 2}},
    ]
    p = tmp_path / "corpus.jsonl"
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(p)


def test_load_content_addressed_dedups(spark, jsonl_path):
    df = load_documents_jsonl(spark, jsonl_path)
    rows = {r.text: r for r in df.collect()}
    # exact duplicate collapsed by the content-addressed id
    assert len(rows) == 3 and df.count() == 3
    # schema contract: doc_id/text first, metadata preserved incl. nested
    assert df.columns[:2] == ["doc_id", "text"]
    assert rows["delta epsilon"].url == "http://b"
    assert rows["zeta"].meta.stars == 2
    # ids are a pure function of text (idempotent re-ingestion)
    again = load_documents_jsonl(spark, jsonl_path)
    assert {r.doc_id for r in again.collect()} == {r.doc_id for r in df.collect()}


def test_load_keeps_duplicates_when_asked(spark, jsonl_path):
    df = load_documents_jsonl(spark, jsonl_path, dedup_exact=False)
    assert df.count() == 4


def test_load_with_existing_ids_and_renames(spark, tmp_path):
    p = tmp_path / "c.jsonl"
    with open(p, "w") as f:
        f.write(json.dumps({"body": "hello world", "id": 7}) + "\n")
        f.write(json.dumps({"body": "goodbye", "id": 9}) + "\n")
    df = load_documents_jsonl(spark, str(p), text_col="body", id_col="id")
    got = {r.doc_id: r.text for r in df.collect()}
    assert got == {7: "hello world", 9: "goodbye"}
    with pytest.raises(ValueError):
        load_documents_jsonl(spark, str(p))  # no 'text' field


def test_round_trip_and_engine_use(spark, jsonl_path, tmp_path):
    """load → BM25 search works on the raw drop; write → load round-trips."""
    from next_plaid_spark.operators.bm25 import BM25Index

    docs = load_documents_jsonl(spark, jsonl_path)
    idx = BM25Index.build(docs)
    q = spark.createDataFrame([(0, "alpha")], "query_id long, text string")
    hits = idx.search(q, k=5).collect()
    assert len(hits) == 1  # one (deduped) doc contains 'alpha'

    out = str(tmp_path / "out_jsonl")
    write_documents_jsonl(docs, out)
    back = load_documents_jsonl(spark, out + "/*.json", id_col="doc_id")
    assert sorted(r.text for r in back.collect()) == \
        sorted(r.text for r in docs.collect())
    assert {r.doc_id for r in back.collect()} == {r.doc_id for r in docs.collect()}


def test_catalog_create_from_jsonl(spark, jsonl_path, tmp_path):
    """The full reference ingestion flow from a raw drop: index builds,
    semantic search returns the right doc, metadata WHERE works."""
    from next_plaid_spark.catalog import IndexCatalog
    from next_plaid_spark.encoding import encode_queries

    cat = IndexCatalog(spark, str(tmp_path / "cat"))
    li = cat.create_from_jsonl("drop", jsonl_path)
    qt = encode_queries(spark.createDataFrame(
        [(0, "delta epsilon")], "query_id long, text string"))
    top = li.searcher().search(qt).orderBy("rank").first()
    docs = {r.doc_id: r.text for r in li.metadata().get().collect()}
    assert docs[top.doc_id] == "delta epsilon"
    # metadata columns from the JSON ride along into the WHERE surface
    en = li.metadata().where_condition("lang = ?", ["en"])
    assert en.count() == 2  # dedup collapsed the duplicate 'en' text


def test_load_documents_csv_and_tsv(spark, tmp_path):
    from next_plaid_spark.sources.corpus_io import load_documents_csv

    p = tmp_path / "c.csv"
    p.write_text('text,lang,score\n"alpha, with comma",en,3\nbeta,de,1\n'
                 '"alpha, with comma",en,9\n')
    df = load_documents_csv(spark, str(p))
    rows = {r.text: r for r in df.collect()}
    assert df.count() == 2  # duplicate text collapsed
    assert rows["beta"].lang == "de" and rows["beta"].score == 1
    t = tmp_path / "c.tsv"
    t.write_text("body\tlang\ngamma delta\tfr\n")
    tdf = load_documents_csv(spark, str(t), sep="\t", text_col="body")
    assert [r.text for r in tdf.collect()] == ["gamma delta"]
    assert tdf.columns[:2] == ["doc_id", "text"]

"""Encoder determinism + cross-engine (DuckDB) bit-parity of token vectors."""

from __future__ import annotations

import math

import duckdb
import numpy as np
from pyspark.sql import functions as F

from next_plaid_spark.encoding import (
    DEFAULT_DIM,
    encode_documents,
    token_vector,
    token_vector_sql,
)


def test_token_vector_unit_norm(spark):
    df = spark.createDataFrame([("hello",), ("world",)], ["token"])
    rows = df.select(token_vector(F.col("token")).alias("vec")).collect()
    for r in rows:
        assert len(r.vec) == DEFAULT_DIM
        assert math.isclose(float(np.linalg.norm(r.vec)), 1.0, rel_tol=1e-12)


def test_token_vector_deterministic(spark):
    df = spark.createDataFrame([("abc",), ("abc",)], ["token"])
    rows = df.select(token_vector(F.col("token")).alias("vec")).collect()
    assert rows[0].vec == rows[1].vec


def test_token_vector_matches_duckdb_bitwise(spark):
    tokens = ["hello", "world", "x1", "queryterm"]
    df = spark.createDataFrame([(t,) for t in tokens], ["token"])
    spark_vecs = {
        r.token: r.vec
        for r in df.select("token", token_vector(F.col("token")).alias("vec")).collect()
    }
    con = duckdb.connect()
    for t in tokens:
        (duck_vec,) = con.execute(
            f"SELECT {token_vector_sql(repr(t))}"
        ).fetchone()
        assert list(spark_vecs[t]) == list(duck_vec), f"mismatch for {t}"


def test_encode_documents_shape(spark, documents):
    toks = encode_documents(documents.limit(20))
    rows = toks.collect()
    assert all(len(r.vec) == DEFAULT_DIM for r in rows)
    assert all(r.token_idx >= 0 for r in rows)
    # same token ⇒ same vector, across documents
    by_token = {}
    for r in rows:
        if r.token in by_token:
            assert by_token[r.token] == r.vec
        by_token[r.token] = r.vec

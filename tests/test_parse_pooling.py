"""P1 ast-based code parsing + P6 Ward pooling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from next_plaid_spark.operators.code_parse import parse_code_units, with_unit_ids
from next_plaid_spark.operators.pooling import pool_doc_tokens, ward_cluster

SAMPLE = '''"""Module doc."""
LIMIT = 10

def top(a, b):
    """Pick the larger."""
    return max(a, b)

class Store:
    """A store."""

    def put(self, key, value):
        self.data[key] = value
        return self.flush()
'''


def test_parse_python_units(spark):
    files = spark.createDataFrame([("pkg/mod.py", SAMPLE)], "path string, content string")
    units = {r.qualified_name: r for r in parse_code_units(files).collect()}
    assert set(units) == {"LIMIT", "top", "Store", "Store.put"}
    top = units["top"]
    assert top.unit_type == "Function" and top.signature == "def top(a, b)"
    assert top.docstring == "Pick the larger." and "max" in top.calls
    put = units["Store.put"]
    assert put.unit_type == "Method" and put.parent_class == "Store"
    assert put.parameters == ["self", "key", "value"] and "flush" in put.calls
    assert units["Store"].unit_type == "Class"
    assert units["LIMIT"].unit_type == "Constant"
    assert top.line == 4 and top.end_line == 6


def test_parse_non_python_rawcode(spark):
    files = spark.createDataFrame(
        [("a.rs", "fn main() {}\n"), ("b.py", "def broken(:\n")],
        "path string, content string",
    )
    rows = parse_code_units(files).collect()
    by_file = {r.file: r for r in rows}
    assert by_file["a.rs"].unit_type == "RawCode"
    assert by_file["b.py"].unit_type == "RawCode"  # syntax error fallback


def test_parse_own_repo_and_search(spark):
    """Parse this repo's own sources and find the BM25 module via
    search_code — the full colgrep lifecycle from raw files."""
    import glob

    from next_plaid_spark.operators.colgrep import search_code

    paths = sorted(glob.glob("/root/repo/next_plaid_spark/operators/*.py"))[:8]
    rows = [(p, open(p).read()) for p in paths]
    files = spark.createDataFrame(rows, "path string, content string")
    units = with_unit_ids(parse_code_units(files)).cache()
    assert units.count() > 30
    hits = search_code(units, "bm25 keyword scoring postings", top_k=3).collect()
    assert hits and any("bm25" in r.file for r in hits), [r.file for r in hits]


def test_ward_cluster_groups_nearby_points():
    x = np.array([[0.0, 0.0], [0.1, 0.0], [5.0, 5.0], [5.1, 5.0]])
    labels = ward_cluster(x, 2)
    assert labels[0] == labels[1] and labels[2] == labels[3]
    assert labels[0] != labels[2]
    # deterministic label order: first-seen row gets cluster 0
    assert labels[0] == 0


def test_pool_doc_tokens(spark):
    rows = [
        (1, 0, [1.0, 0.0]), (1, 1, [0.99, 0.01]),
        (1, 2, [0.0, 1.0]), (1, 3, [0.01, 0.99]),
    ]
    dt = spark.createDataFrame(rows, "doc_id long, token_idx int, vec array<double>")
    pooled = pool_doc_tokens(dt, pool_factor=2).collect()
    assert len(pooled) == 2  # ceil(4/2)
    vecs = np.array([r.vec for r in sorted(pooled, key=lambda r: r.token_idx)])
    assert np.allclose(np.linalg.norm(vecs, axis=1), 1.0)
    # one pooled vector near x-axis, one near y-axis
    assert {np.argmax(v) for v in vecs} == {0, 1}


def test_pool_protected_tokens(spark):
    rows = [(1, i, [float(i == j) for j in range(4)]) for i in range(4)]
    dt = spark.createDataFrame(rows, "doc_id long, token_idx int, vec array<double>")
    pooled = pool_doc_tokens(dt, pool_factor=4, protected_tokens=2).collect()
    # 2 protected + ceil(2/4)=1 pooled
    assert len(pooled) == 3
    first_two = [r.vec for r in sorted(pooled, key=lambda r: r.token_idx)[:2]]
    assert first_two[0][0] == 1.0 and first_two[1][1] == 1.0


def test_pool_factor_one_noop(spark):
    dt = spark.createDataFrame(
        [(1, 0, [1.0, 0.0])], "doc_id long, token_idx int, vec array<double>"
    )
    assert pool_doc_tokens(dt, pool_factor=1) is dt

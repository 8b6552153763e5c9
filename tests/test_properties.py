"""Property-based invariants (hypothesis) over the pure kernels — the test
dimension the reference lacks entirely (SURVEY §5.6: no property-based or
randomized testing). Spark stays out of the hot loop: properties exercise
the NumPy/driver kernels the distributed operators wrap, so thousands of
examples run in seconds."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from next_plaid_spark.operators.codec import _pack, _unpack


# -- codec bit-packing ---------------------------------------------------------


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=1, max_value=64).flatmap(
        lambda dim: st.tuples(
            st.just(dim),
            st.sampled_from([2, 4]),
            st.lists(st.integers(0, 3), min_size=dim, max_size=dim),
        )
    )
)
def test_pack_unpack_roundtrip_property(t):
    dim, nbits, idx = t
    idx = np.asarray([i % (1 << nbits) for i in idx], dtype=np.int64)
    raw = _pack(idx, nbits)
    assert len(raw) == (dim * nbits + 7) // 8
    out = _unpack(raw, dim, nbits)
    assert np.array_equal(out, idx)


# -- BPE training/segmentation -------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.lists(st.text(alphabet="abcd", min_size=1, max_size=6),
                min_size=1, max_size=30))
def test_bpe_segment_reassembles_word(words):
    from next_plaid_spark.operators.corpus import bpe_segment

    # merges learned from any rank table must re-concatenate to the word
    ranks = {("a", "b"): 0, ("ab", "c"): 1, ("c", "d"): 2, ("b", "c"): 3}
    for w in words:
        pieces = bpe_segment(w, ranks)
        assert "".join(pieces) == w
        assert all(pieces)


# -- MaxSim kernel vs naive reference ------------------------------------------


@settings(max_examples=50, deadline=None)
@given(st.integers(1, 6), st.integers(1, 8), st.integers(2, 8),
       st.integers(0, 2**31 - 1))
def test_maxsim_kernel_matches_naive(nq, nd, dim, seed):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((nq, dim))
    d = rng.standard_normal((nd, dim))
    fast = (q @ d.T).max(axis=1).sum()
    naive = sum(max(float(np.dot(qr, dr)) for dr in d) for qr in q)
    assert np.isclose(fast, naive, rtol=1e-9)


# -- Winnowing guarantee (pure recomputation of the operator's math) -----------


def _winnow_py(tokens, k, w):
    import hashlib

    grams = [" ".join(tokens[i:i + k]) for i in range(len(tokens) - k + 1)]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    return {min(hs[i:i + w]) for i in range(len(hs) - w + 1)}


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.sampled_from([f"t{i}" for i in range(12)]), min_size=0, max_size=10),
    st.lists(st.sampled_from([f"u{i}" for i in range(12)]), min_size=0, max_size=10),
    st.lists(st.sampled_from([f"s{i}" for i in range(40)]), min_size=7, max_size=7),
)
def test_winnowing_guarantee_property(prefix_a, prefix_b, shared):
    # two token streams sharing a k+w-1 = 7 run must share a fingerprint
    k = w = 4
    a = prefix_a + shared
    b = prefix_b + shared + ["z1", "z2"]
    assert _winnow_py(a, k, w) & _winnow_py(b, k, w)


# -- Gumbel-key selection determinism ------------------------------------------


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(0, 10**6), min_size=1, max_size=50, unique=True))
def test_dsir_hash_uniform_bounds(doc_ids):
    import hashlib

    for d in doc_ids:
        h = int(hashlib.md5(f"42:dsir:{d}".encode()).hexdigest()[:15], 16)
        u = (h % 1_000_000 + 0.5) / 1_000_000.0
        assert 0.0 < u < 1.0
        g = -np.log(-np.log(u))
        assert np.isfinite(g)


# -- WHERE-grammar cross-engine agreement ----------------------------------------
#
# Random grammar-valid conditions over the documents columns must select the
# IDENTICAL doc set via Spark (MetadataStore.where_condition) and DuckDB
# (bind_condition_duckdb). One Spark session + one cached DF serve all
# examples; hypothesis drives the condition shapes.

import duckdb as _duckdb
import pytest as _pytest


def _atom(draw, st):
    col, op = draw(st.sampled_from([
        ("lang", "="), ("lang", "!="), ("source", "="),
        ("n_chars", ">"), ("n_chars", "<="), ("n_chars", "="),
    ]))
    if col == "lang":
        return f"{col} {op} ?", [draw(st.sampled_from(["en", "fr", "de", "xx"]))]
    if col == "source":
        return f"{col} {op} ?", [draw(st.sampled_from(["src0", "src1", "src9"]))]
    return f"{col} {op} ?", [draw(st.integers(100, 400))]


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_where_grammar_cross_engine_agreement(_where_env, data):
    spark_store, con = _where_env
    from next_plaid_spark.filtering import bind_condition_duckdb

    n_atoms = data.draw(st.integers(1, 3))
    parts, params = [], []
    for j in range(n_atoms):
        c, p = _atom(data.draw, st)
        parts.append(c)
        params.extend(p)
    glue = data.draw(st.sampled_from([" AND ", " OR "]))
    cond = glue.join(parts)
    if data.draw(st.booleans()) and n_atoms > 1:
        cond = f"({parts[0]}){glue}({glue.join(parts[1:])})"

    got = sorted(
        r.doc_id for r in spark_store.where_condition(cond, params).collect()
    )
    want = sorted(
        r[0] for r in con.execute(
            f"SELECT doc_id FROM documents WHERE {bind_condition_duckdb(cond, params)}"
        ).fetchall()
    )
    assert got == want, f"cond={cond!r} params={params}"


@_pytest.fixture(scope="module")
def _where_env():
    from next_plaid_spark.filtering import MetadataStore
    from next_plaid_spark.session import get_spark

    spark = get_spark("where-prop")
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").cache()
    docs.count()
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM '/root/testdata/sf0.01/documents.parquet'"
    )
    yield MetadataStore(docs), con


def test_bigram_logprob_hand_computed(spark):
    import math

    from next_plaid_spark.operators.textstats import bigram_logprob

    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a a")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.bits_per_token, r.n_tokens)
           for r in bigram_logprob(docs, lam=0.7).collect()}
    p_uni = {"a": 4 / 6, "b": 2 / 6}
    p_bi = {("a", "b"): 2 / 3, ("b", "a"): 1.0, ("a", "a"): 1 / 3}

    def interp(prev, cur):
        return 0.7 * p_bi[(prev, cur)] + 0.3 * p_uni[cur]

    d0 = [-math.log2(p_uni["a"]), -math.log2(interp("a", "b")),
          -math.log2(interp("b", "a")), -math.log2(interp("a", "b"))]
    d1 = [-math.log2(p_uni["a"]), -math.log2(interp("a", "a"))]
    import pytest as _pt
    assert got[0][1] == 4 and got[1][1] == 2
    assert got[0][0] == _pt.approx(sum(d0) / 4, abs=1e-9)
    assert got[1][0] == _pt.approx(sum(d1) / 2, abs=1e-9)

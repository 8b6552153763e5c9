"""Text tokenizers and string helpers.

Parity targets (behavior, not code):
- ``unicode61`` word tokenizer — SQLite FTS5 default used by the reference
  (next-plaid/src/text_search.rs:52-113): lowercase, split on
  non-alphanumeric. We restrict to ASCII [a-z0-9] runs, which matches the
  driver's synthetic latin-ish corpus and is expressible identically in
  DuckDB (`string_split_regex(lower(x), '[^a-z0-9]+')`).
- ``trigram`` tokenizer (text_search.rs:52-113): all character 3-grams of the
  lowercased text.
- ``identifier_aware`` tokenizer (text_search.rs:115-247): camelCase /
  snake_case splitting with compound + bigram tokens — implemented in
  operators/bm25.py where it is used.

Everything here is built-in-function only (whole-stage codegen), no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Regex shared verbatim with the DuckDB oracle SQL.
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def tokenize_unicode61(text: Column) -> Column:
    """Lowercase word tokens, empties removed. Returns ARRAY<STRING>."""
    return F.filter(
        F.split(F.lower(text), TOKEN_SPLIT_RE),
        lambda t: t != "",
    )


def tokenize_trigram(text: Column) -> Column:
    """All character 3-grams of lower(text). Returns ARRAY<STRING>."""
    lowered = F.lower(text)
    n = F.length(lowered)
    return F.when(n < 3, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - 2),
            lambda i: F.substring(lowered, i, 3),
        )
    )

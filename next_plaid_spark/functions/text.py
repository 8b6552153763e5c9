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
    """Lowercase word tokens, empties removed. Returns ARRAY<STRING>.

    Cross-engine note: Java's full case mapping lowercases U+0130 (İ) to
    "i" + U+0307 (combining dot above), whose combining char would split
    the token, while DuckDB maps it to plain "i" — the one code point
    whose lowercasing changes the [a-z0-9] run structure differently per
    engine. Pre-folding İ→i keeps the DuckDB oracle bit-exact on any
    corpus (no-op for text without İ); pinned by the unicode parity test.

    MIGRATION (r11 fold): the fold changes tokenization — and with it
    shingles, minhash signatures, simhash, and Bloom bit positions — for
    any İ-containing doc. Persisted state computed BEFORE the fold
    (cross-batch minhash/Bloom dedup ledgers, fingerprint tables) can
    silently disagree with newly computed hashes and miss true
    duplicates of such docs; if a corpus can contain U+0130, rebuild
    those artifacts from the kept corpus once after upgrading."""
    return F.filter(
        F.split(F.lower(F.translate(text, "İ", "i")), TOKEN_SPLIT_RE),
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

"""Unicode text normalization — the canonicalization pass a training-data
pipeline runs BEFORE hashing/dedup/tokenization (composed vs decomposed
accents, compatibility ligatures, stray whitespace all break exact-dedup
and shingle identity if left unnormalized).

No reference counterpart (next-plaid's FTS tokenizers fold case per
SQLite unicode61 but never form-normalize); extension-surface operator.

Spark has no built-in unicode form normalization, so this is a pandas-UDF
stage — but a *vectorized* one: ``Series.str.normalize`` (NFC/NFKC/NFD/
NFKD) and the case/whitespace steps all run as pandas string kernels over
Arrow batches; no per-row Python except the optional accent-strip (which
needs per-char ``unicodedata.combining`` — documented slow path, off by
default). Stateless map stage: no shuffle, scales with partitions.

Cross-engine parity: DuckDB's ``nfc_normalize`` + ``lower`` +
``regexp_replace`` reproduce the default pipeline bit-for-bit (pytest
checks unicode fixtures: combining accents, NFKC ligatures/width folds);
the ``text_normalize`` oracle entry pins the distributed plumbing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_FORMS = ("NFC", "NFKC", "NFD", "NFKD")

# One EXPLICIT whitespace class shared by both engines: Python re's \s is
# Unicode-aware (matches NBSP, U+2028, …) while DuckDB/RE2's \s is
# ASCII-only, so a literal \s silently diverges cross-engine. The class
# below spells out Python's str-mode \s set; _WS_DUCK is the same set in
# RE2 syntax (\x{…} escapes).
_WS_PY = (
    "[ \\t\\n\\r\\f\\v\\x1c-\\x1f\\x85\\xa0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000]"
)
_WS_DUCK = (
    "[ \\t\\n\\r\\f\\v\\x1c-\\x1f\\x{0085}\\x{00A0}\\x{1680}"
    "\\x{2000}-\\x{200A}\\x{2028}\\x{2029}\\x{202F}\\x{205F}\\x{3000}]"
)


def normalize_text(docs: DataFrame, *, form: str = "NFC",
                   lower: bool = True, collapse_ws: bool = True,
                   strip_accents: bool = False,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, norm_text, n_chars): unicode-normalized text.

    Order of operations (fixed, so results are reproducible): form
    normalization → optional accent strip (NFD + drop combining marks +
    re-normalize to ``form``) → optional lowercase → optional whitespace
    collapse (runs of whitespace → single space, ends trimmed).
    """
    if form not in _FORMS:
        raise ValueError(f"unknown normalization form: {form!r}")

    def norm(batches):
        import unicodedata

        for pdf in batches:
            s = pdf[text_col].astype("string").fillna("")
            s = s.str.normalize(form)
            if strip_accents:
                s = s.map(
                    lambda t: unicodedata.normalize(
                        form,
                        "".join(c for c in unicodedata.normalize("NFD", t)
                                if not unicodedata.combining(c)),
                    )
                ).astype("string")
            if lower:
                s = s.str.lower()
            if collapse_ws:
                s = s.str.replace(_WS_PY + "+", " ", regex=True).str.strip()
            out = pdf[[id_col]].copy()
            out.columns = ["doc_id"]
            out["norm_text"] = s
            out["n_chars"] = s.str.len().astype("int64")
            yield out

    return docs.select(id_col, text_col).mapInPandas(
        norm, schema="doc_id long, norm_text string, n_chars long"
    )


def sql_normalize_text(*, lower: bool = True) -> str:
    """DuckDB mirror of the DEFAULT pipeline (NFC, lowercase, whitespace
    collapse) over ``documents``."""
    inner = "nfc_normalize(coalesce(text, ''))"
    if lower:
        inner = f"lower({inner})"
    repl = f"regexp_replace({inner}, '{_WS_DUCK}+', ' ', 'g')"
    return f"""
SELECT doc_id,
       trim({repl}) AS norm_text,
       length(trim({repl})) AS n_chars
FROM documents
""".strip()

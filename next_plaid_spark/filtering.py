"""Metadata filtering — F1-F9 (SURVEY.md §2.2).

The reference validates filter conditions against a restricted WHERE grammar
before ever touching SQLite (next-plaid/src/filtering.rs:115-583, safety
pre-check 145-181), with ``?`` placeholders as the only value form:

    condition := or_expr
    or_expr   := and_expr (OR and_expr)*
    and_expr  := not_expr (AND not_expr)*
    not_expr  := NOT not_expr | '(' condition ')' | predicate
    predicate := column ( (=|!=|<>|<|<=|>|>=) ? | [NOT] LIKE ?
                 | [NOT] REGEXP ? | [NOT] BETWEEN ? AND ?
                 | [NOT] IN (?, …) | IS [NOT] NULL )

Catalyst parses full SQL, so validation is kept purely for API parity /
injection safety (SURVEY §4.1) — after validation + binding, the condition
becomes an ordinary ``df.filter(expr)`` and Catalyst pushes it into the
Parquet scan. ``REGEXP`` maps to Spark ``RLIKE`` (F3; the reference's
fancy-regex features like lookaround would need a pandas UDF — not required
by the test corpus).

This module reimplements the *grammar contract* from the spec above; no
reference code is copied.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class FilterValidationError(ValueError):
    pass


# -- lexer -------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) | (?P<comma>,) |
        (?P<op><=|>=|<>|!=|=|<|>) |
        (?P<placeholder>\?) |
        (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    )""",
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "like", "regexp", "between", "in", "is", "null"}

# Safety pre-check (filtering.rs:145-181 analog): reject anything that could
# smuggle SQL past the grammar even before tokenizing.
_FORBIDDEN_RE = re.compile(
    r"(;|--|/\*|\*/|'|\"|`|\\|\b(select|union|insert|update|delete|drop|attach|pragma|exec)\b)",
    re.IGNORECASE,
)


@dataclass
class _Tok:
    kind: str  # lparen rparen comma op placeholder ident kw:<word>
    text: str


def _lex(cond: str) -> list[_Tok]:
    if _FORBIDDEN_RE.search(cond):
        raise FilterValidationError("forbidden token in filter condition")
    toks: list[_Tok] = []
    pos = 0
    while pos < len(cond):
        m = _TOKEN_RE.match(cond, pos)
        if not m:
            if cond[pos:].strip() == "":
                break
            raise FilterValidationError(f"unexpected character at {pos}: {cond[pos:pos+10]!r}")
        pos = m.end()
        for kind, text in m.groupdict().items():
            if text is not None:
                if kind == "ident" and text.lower() in _KEYWORDS:
                    toks.append(_Tok(f"kw:{text.lower()}", text))
                else:
                    toks.append(_Tok(kind, text))
                break
    return toks


# -- parser ------------------------------------------------------------------

class _Parser:
    """Recursive-descent over the allowlist grammar. ``parse`` returns the
    number of placeholders consumed (binding order)."""

    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.i = 0
        self.n_placeholders = 0
        self.columns: list[str] = []

    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self, kind: str | None = None) -> _Tok:
        t = self.peek()
        if t is None:
            raise FilterValidationError("unexpected end of condition")
        if kind is not None and t.kind != kind:
            raise FilterValidationError(f"expected {kind}, got {t.text!r}")
        self.i += 1
        return t

    def parse(self):
        self.or_expr()
        if self.peek() is not None:
            raise FilterValidationError(f"trailing tokens: {self.peek().text!r}")

    def or_expr(self):
        self.and_expr()
        while (t := self.peek()) and t.kind == "kw:or":
            self.take()
            self.and_expr()

    def and_expr(self):
        self.not_expr()
        while (t := self.peek()) and t.kind == "kw:and":
            self.take()
            self.not_expr()

    def not_expr(self):
        t = self.peek()
        if t and t.kind == "kw:not":
            self.take()
            self.not_expr()
            return
        if t and t.kind == "lparen":
            self.take()
            self.or_expr()
            self.take("rparen")
            return
        self.predicate()

    def _value(self):
        self.take("placeholder")
        self.n_placeholders += 1

    def predicate(self):
        col = self.take("ident")
        self.columns.append(col.text)
        t = self.peek()
        if t is None:
            raise FilterValidationError(f"dangling column {col.text!r}")
        negated = False
        if t.kind == "kw:not":
            self.take()
            negated = True
            t = self.peek()
            if t is None or t.kind not in ("kw:like", "kw:regexp", "kw:between", "kw:in"):
                raise FilterValidationError("NOT must precede LIKE/REGEXP/BETWEEN/IN")
        if t.kind == "op":
            if negated:
                raise FilterValidationError("NOT before comparison operator")
            self.take()
            self._value()
        elif t.kind in ("kw:like", "kw:regexp"):
            self.take()
            self._value()
        elif t.kind == "kw:between":
            self.take()
            self._value()
            self.take("kw:and")
            self._value()
        elif t.kind == "kw:in":
            self.take()
            self.take("lparen")
            self._value()
            while (p := self.peek()) and p.kind == "comma":
                self.take()
                self._value()
            self.take("rparen")
        elif t.kind == "kw:is":
            if negated:
                raise FilterValidationError("NOT before IS")
            self.take()
            if (p := self.peek()) and p.kind == "kw:not":
                self.take()
            self.take("kw:null")
        else:
            raise FilterValidationError(f"invalid predicate after {col.text!r}: {t.text!r}")


def validate_condition(cond: str) -> int:
    """Validate against the allowlist grammar; returns placeholder count.
    Raises FilterValidationError on any violation."""
    toks = _lex(cond)
    if not toks:
        raise FilterValidationError("empty condition")
    p = _Parser(toks)
    p.parse()
    return p.n_placeholders


# -- binding -----------------------------------------------------------------

def _render_param(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    raise FilterValidationError(f"unsupported parameter type {type(v).__name__}")


def bind_condition(cond: str, params: list) -> str:
    """Validated condition + params → SQL expression string (Spark dialect:
    REGEXP → RLIKE). Placeholders bind left to right (filtering.rs:633-650)."""
    n = validate_condition(cond)
    if n != len(params):
        raise FilterValidationError(f"expected {n} params, got {len(params)}")
    out, pi = [], 0
    for t in _lex(cond):
        if t.kind == "placeholder":
            out.append(_render_param(params[pi]))
            pi += 1
        elif t.kind == "kw:regexp":
            out.append("RLIKE")
        else:
            out.append(t.text)
    return " ".join(out)


def bind_condition_duckdb(cond: str, params: list) -> str:
    """Same binding rendered for DuckDB (REGEXP col ? → regexp_matches)."""
    n = validate_condition(cond)
    if n != len(params):
        raise FilterValidationError(f"expected {n} params, got {len(params)}")
    toks = _lex(cond)
    out, pi, i = [], 0, 0
    while i < len(toks):
        t = toks[i]
        if t.kind == "kw:regexp" or (
            t.kind == "kw:not" and i + 1 < len(toks) and toks[i + 1].kind == "kw:regexp"
        ):
            neg = t.kind == "kw:not"
            col = out.pop()
            pat = _render_param(params[pi])
            pi += 1
            out.append(f"{'NOT ' if neg else ''}regexp_matches({col}, {pat})")
            i += 2 if neg else 1
            i += 1  # skip the placeholder token
            continue
        if t.kind == "placeholder":
            out.append(_render_param(params[pi]))
            pi += 1
        else:
            out.append(t.text)
        i += 1
    return " ".join(out)


# -- the store (F2-F9) ---------------------------------------------------------

class MetadataStore:
    """Spark SQL *is* the metadata engine (SURVEY §1.1): the reference's
    SQLite METADATA table maps to ordinary columns on a DataFrame keyed by
    doc_id; thin/fat split and dense-id resequencing are obsolete under
    Parquet column pruning + stable ids (filtering.rs:52-91 → moot)."""

    def __init__(self, df: DataFrame, id_col: str = "doc_id"):
        self.df = df
        self.id_col = id_col

    def where_condition(self, cond: str, params: list) -> DataFrame:
        """F2/F3: → subset DataFrame (doc_id), ordered semantics left to
        the consumer (Spark results are unordered by contract)."""
        return self.df.filter(F.expr(bind_condition(cond, params))).select(
            F.col(self.id_col).alias("doc_id")
        )

    def where_condition_regexp(self, column: str, pattern: str,
                               *, extra_cond: str | None = None,
                               extra_params: list | None = None) -> DataFrame:
        """F3 full parity (filtering.rs:1969-2060): regex search with the
        reference's fancy-regex semantics — lookarounds and backreferences —
        which Spark's RLIKE (java.util.regex without backrefs-in-pattern
        validation quirks) can't always express. Python ``re`` supports
        both, so the predicate runs as an Arrow-batched pandas UDF with the
        pattern compiled ONCE in the closure (the reference precompiles
        too, filtering.rs:1984-2007). Runtime pattern errors degrade to
        no-match, mirroring the backtrack-limit behavior.

        ``extra_cond``/``extra_params`` AND a validated grammar condition
        into the same scan (pushed to Parquet; the regex runs post-scan)."""
        import re as _re

        import pandas as pd
        from pyspark.sql.functions import pandas_udf

        try:
            compiled = _re.compile(pattern)
        except _re.error:
            compiled = None

        def _matches(s):
            if compiled is None:
                return pd.Series([False] * len(s))
            return s.map(lambda v: v is not None and compiled.search(v) is not None)

        matches = pandas_udf(_matches, "boolean")

        out = self.df
        if extra_cond is not None:
            out = out.filter(F.expr(bind_condition(extra_cond, extra_params or [])))
        return out.filter(matches(F.col(column))).select(
            F.col(self.id_col).alias("doc_id")
        )

    def get(self, *, ids: list[int] | None = None, cond: str | None = None,
            params: list | None = None) -> DataFrame:
        """F4: full rows by id list or by condition."""
        if ids is not None:
            return self.df.filter(F.col(self.id_col).isin([int(i) for i in ids]))
        if cond is not None:
            return self.df.filter(F.expr(bind_condition(cond, params or [])))
        return self.df

    def get_distinct_strings(self, column: str) -> DataFrame:
        """F5: SELECT DISTINCT col WHERE col IS NOT NULL."""
        return (
            self.df.select(column)
            .filter(F.col(column).isNotNull())
            .distinct()
        )

    def update_where(self, column: str, value, cond: str, params: list) -> DataFrame:
        """F6: returns a new DataFrame with ``column`` set where cond holds
        (pure — caller persists; Delta MERGE at cluster scale)."""
        pred = F.expr(bind_condition(cond, params))
        return self.df.withColumn(
            column, F.when(pred, F.lit(value)).otherwise(F.col(column))
        )

    def count(self, cond: str | None = None, params: list | None = None) -> int:
        """F7."""
        if cond is None:
            return self.df.count()
        return self.df.filter(F.expr(bind_condition(cond, params or []))).count()

"""P1 seam: the env-gated real-tree-sitter boundary backend.

The reference's extractor is tree-sitter (colgrep/src/parser/
extract.rs:1-825); this container ships no py-tree-sitter, so the default
backend is the ast-lite scanners. These tests pin the seam the same way
test_encode_real_model.py pins the encoder seam:

- the wiring tests ALWAYS run: backend off by default, clean fallback;
- the parity tests run only where ``tree_sitter`` + a grammar import,
  comparing unit BOUNDARIES (name, qualified_name, unit_type, line,
  end_line, parent_class) against the scanner on fixtures where the
  scanner's line heuristics are exact — the two backends must agree.

To run the parity leg:  pip install tree-sitter tree-sitter-python \
    tree-sitter-rust tree-sitter-javascript  (or tree-sitter-languages),
then  NEXT_PLAID_SPARK_TS=1 pytest tests/test_code_parse_treesitter.py
"""

from __future__ import annotations

import pytest

from next_plaid_spark.operators.code_parse import (
    _parse_one,
    _ts_parser,
    _ts_try_parse,
)

PY_SRC = '''\
import os

def top(a, b):
    """Adds."""
    return a + b

class Greeter:
    """A class."""

    def greet(self, name):
        return "hi " + name

    def shout(self, name):
        x = self.greet(name)
        return x.upper()

def tail():
    return os.getpid()
'''

RS_SRC = """\
/// A point.
pub struct Point {
    x: f64,
    y: f64,
}

impl Point {
    pub fn norm(&self) -> f64 {
        (self.x * self.x + self.y * self.y).sqrt()
    }
}

pub fn free_fn(v: i64) -> i64 {
    v * 2
}
"""

JS_SRC = """\
class Cart {
  add(item) {
    this.items.push(item);
  }
}

function total(items) {
  return items.length;
}
"""

FIXTURES = [("m.py", PY_SRC, "python"), ("lib.rs", RS_SRC, "rust"),
            ("app.js", JS_SRC, "javascript")]


def _boundaries(units):
    # (name, qualified_name, unit_type, line, end_line, parent_class) —
    # tuple indices match the scanner 13-tuple / finalized 16-tuple prefix
    return sorted((u[1], u[2], u[3], u[4], u[5], u[9]) for u in units)


def test_backend_off_by_default(monkeypatch):
    """Without NEXT_PLAID_SPARK_TS the seam must be a strict no-op — even
    if a grammar IS importable — so installed-by-chance libs never change
    results under the driver's gate."""
    monkeypatch.delenv("NEXT_PLAID_SPARK_TS", raising=False)
    for path, src, lang in FIXTURES:
        assert _ts_parser(lang) is None
        assert _ts_try_parse(path, src, lang) is None


def test_backend_on_without_libs_falls_back(monkeypatch):
    """Env set but libs absent: _parse_one must silently use the scanner
    (feature detection, not an import error in the executor)."""
    monkeypatch.setenv("NEXT_PLAID_SPARK_TS", "1")
    monkeypatch.setattr(
        "next_plaid_spark.operators.code_parse._TS_PARSER_CACHE", {})
    for path, src, lang in FIXTURES:
        units = _parse_one(path, src)
        assert units, f"no units for {path}"
        assert all(u[12] == lang for u in units)


def _ts_available() -> bool:
    try:
        import tree_sitter  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(not _ts_available(),
                    reason="py-tree-sitter not installed (optional seam)")
@pytest.mark.parametrize("path,src,lang", FIXTURES)
def test_treesitter_backend_boundary_parity(monkeypatch, path, src, lang):
    """Where both backends can be exact, they must AGREE: same units, same
    kinds, same line spans, same class nesting."""
    monkeypatch.setenv("NEXT_PLAID_SPARK_TS", "1")
    monkeypatch.setattr(
        "next_plaid_spark.operators.code_parse._TS_PARSER_CACHE", {})
    ts_units = _ts_try_parse(path, src, lang)
    if ts_units is None:
        pytest.skip(f"no {lang} grammar installed")
    monkeypatch.delenv("NEXT_PLAID_SPARK_TS")
    scanner_units = _parse_one(path, src)
    scanner_real = [u for u in scanner_units if u[3] != "RawCode"]
    assert _boundaries(ts_units) == _boundaries(scanner_real)

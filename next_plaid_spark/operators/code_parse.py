"""Code-unit extraction — P1 (SURVEY.md §2.7).

The reference parses 25+ languages with tree-sitter
(colgrep/src/parser/extract.rs:1-825) into CodeUnit rows. py-tree-sitter is
not in this container, so:

- Python is parsed for real with the stdlib ``ast`` module (functions /
  methods / classes with signature, docstring, params, calls, line spans —
  the FIXTURES.md §6 column contract);
- Rust and JavaScript get an ast-lite line scanner (doc-comment capture,
  brace-matched spans, impl/class method contexts) matching the unit
  shapes asserted in colgrep/src/parser/tests/test_rust.rs and
  test_javascript.rs;
- anything else falls through to a whole-file RawCode unit.

Swapping in tree-sitter later only replaces ``_parse_one`` — the
distributed shape (``mapInPandas`` over (path, content) rows) is the
operator.
"""

from __future__ import annotations

import ast
import re

from pyspark.sql import DataFrame

UNITS_OUT_SCHEMA = (
    "file string, name string, qualified_name string, unit_type string, "
    "line int, end_line int, signature string, docstring string, "
    "parameters array<string>, parent_class string, calls array<string>, "
    "code string, language string"
)


def _calls_of(node: ast.AST) -> list[str]:
    out = []
    for n in ast.walk(node):
        if isinstance(n, ast.Call):
            f = n.func
            if isinstance(f, ast.Name):
                out.append(f.id)
            elif isinstance(f, ast.Attribute):
                out.append(f.attr)
    return sorted(set(out))


def _signature(fn: ast.FunctionDef | ast.AsyncFunctionDef) -> str:
    args = [a.arg for a in fn.args.args]
    if fn.args.vararg:
        args.append("*" + fn.args.vararg.arg)
    args += [a.arg for a in fn.args.kwonlyargs]
    if fn.args.kwarg:
        args.append("**" + fn.args.kwarg.arg)
    return f"def {fn.name}({', '.join(args)})"


# -- Rust / JavaScript ast-lite extraction -------------------------------------

_CALL_RE = re.compile(r"\b([A-Za-z_][A-Za-z0-9_]*)\s*\(")
_NON_CALL_KEYWORDS = frozenset(
    "if while for match switch return fn function catch loop unsafe "
    "new async await typeof super constructor".split()
)

_RUST_FN_RE = re.compile(
    r"^\s*(?:pub(?:\([^)]*\))?\s+)?(?:const\s+)?(?:async\s+)?(?:unsafe\s+)?"
    r"(?:extern\s+\"[^\"]*\"\s+)?fn\s+([A-Za-z_][A-Za-z0-9_]*)"
)
_RUST_TYPE_RE = re.compile(
    r"^\s*(?:pub(?:\([^)]*\))?\s+)?(?:struct|enum|trait)\s+([A-Za-z_][A-Za-z0-9_]*)"
)
_RUST_IMPL_RE = re.compile(
    r"^\s*impl(?:\s*<[^>]*>)?\s+(?:[A-Za-z_][A-Za-z0-9_:<>, ]*\s+for\s+)?"
    r"([A-Za-z_][A-Za-z0-9_]*)"
)
_RUST_CONST_RE = re.compile(
    r"^\s*(?:pub(?:\([^)]*\))?\s+)?(?:const|static)\s+([A-Z_][A-Z0-9_]*)\s*:"
)

_JS_FN_RE = re.compile(
    r"^\s*(?:export\s+)?(?:default\s+)?(?:async\s+)?function\s*\*?\s*"
    r"([A-Za-z_$][A-Za-z0-9_$]*)\s*\("
)
_JS_ARROW_RE = re.compile(
    r"^\s*(?:export\s+)?(?:const|let|var)\s+([A-Za-z_$][A-Za-z0-9_$]*)\s*=\s*"
    r"(?:async\s*)?(?:\([^)]*\)|[A-Za-z_$][A-Za-z0-9_$]*)\s*=>"
)
_JS_FNEXPR_RE = re.compile(
    r"^\s*(?:export\s+)?(?:const|let|var)\s+([A-Za-z_$][A-Za-z0-9_$]*)\s*=\s*"
    r"(?:async\s+)?function\s*\*?\s*\("
)
_JS_CLASS_RE = re.compile(
    r"^\s*(?:export\s+)?(?:default\s+)?class\s+([A-Za-z_$][A-Za-z0-9_$]*)"
)
_JS_METHOD_RE = re.compile(
    r"^\s*(?:static\s+)?(?:async\s+)?(?:get\s+|set\s+)?\*?\s*"
    r"([A-Za-z_$][A-Za-z0-9_$]*)\s*\([^)]*\)\s*\{"
)
_JS_CONST_RE = re.compile(
    r"^\s*(?:export\s+)?const\s+([A-Z_$][A-Z0-9_$]*)\s*="
)
_JS_KEYWORD_NOT_METHOD = frozenset("if for while switch catch function return".split())


def _strip_code_line(line: str) -> str:
    """Drop line comments and string contents so brace counting is sane."""
    out = []
    i, n = 0, len(line)
    in_str: str | None = None
    while i < n:
        ch = line[i]
        if in_str:
            if ch == "\\":
                i += 2
                continue
            if ch == in_str:
                in_str = None
            i += 1
            continue
        if ch in "\"'`":
            in_str = ch
            i += 1
            continue
        if ch == "/" and i + 1 < n and line[i + 1] == "/":
            break
        out.append(ch)
        i += 1
    return "".join(out)


def _brace_end(lines: list[str], start: int) -> int:
    """1-based end line of the block opened at ``lines[start-1]``; falls back
    to the start line if no brace opens there (expression-bodied)."""
    depth = 0
    opened = False
    for i in range(start - 1, len(lines)):
        s = _strip_code_line(lines[i])
        for ch in s:
            if ch == "{":
                depth += 1
                opened = True
            elif ch == "}":
                depth -= 1
                if opened and depth == 0:
                    return i + 1
        if not opened and (";" in s or i > start + 2):
            return i + 1
    return len(lines)


def _calls_in(text: str, own_name: str) -> list[str]:
    names = {
        m.group(1)
        for m in _CALL_RE.finditer(text)
        if m.group(1) not in _NON_CALL_KEYWORDS and m.group(1) != own_name
    }
    return sorted(names)


def _params_rust(sig: str) -> list[str]:
    m = re.search(r"\(([^)]*)\)", sig)
    if not m:
        return []
    out = []
    for part in m.group(1).split(","):
        part = part.strip()
        if not part or part in ("&self", "self", "&mut self", "mut self"):
            continue
        name = part.split(":")[0].strip().lstrip("&").replace("mut ", "").strip()
        if re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
            out.append(name)
    return out


def _params_js(sig: str) -> list[str]:
    m = re.search(r"\(([^)]*)\)", sig)
    if not m:
        # single-arg arrow without parens: const f = x => ...
        m2 = re.search(r"=\s*(?:async\s*)?([A-Za-z_$][A-Za-z0-9_$]*)\s*=>", sig)
        return [m2.group(1)] if m2 else []
    out = []
    for part in m.group(1).split(","):
        name = part.strip().split("=")[0].strip().lstrip(".")
        if re.fullmatch(r"[A-Za-z_$][A-Za-z0-9_$]*", name):
            out.append(name)
    return out


def _doc_above(lines: list[str], start: int, kind: str) -> str | None:
    """Doc comment ending on the line above ``start`` (1-based).

    kind='rust': contiguous /// or //! lines; kind='js': a /** … */ block.
    Joined with spaces the way the reference flattens them."""
    i = start - 2
    if kind == "rust":
        doc: list[str] = []
        while i >= 0 and re.match(r"\s*//[/!]", lines[i]):
            doc.append(re.sub(r"\s*//[/!]\s?", "", lines[i]).strip())
            i -= 1
        if doc:
            return " ".join(x for x in reversed(doc)).strip() or None
        return None
    if i >= 0 and lines[i].strip().endswith("*/"):
        doc = []
        while i >= 0:
            t = lines[i].strip()
            doc.append(re.sub(r"^/?\*+\s?|\s*\*+/$", "", t).strip())
            if t.startswith("/**") or t.startswith("/*"):
                break
            i -= 1
        return " ".join(x for x in reversed(doc) if x).strip() or None
    return None


def _parse_rust(path: str, content: str) -> list[tuple]:
    lines = (content or "").splitlines()
    units: list[tuple] = []
    impl_ctx: list[tuple[str, int]] = []  # (type name, end_line)
    i = 0
    while i < len(lines):
        lineno = i + 1
        line = lines[i]
        while impl_ctx and lineno > impl_ctx[-1][1]:
            impl_ctx.pop()
        m = _RUST_IMPL_RE.match(line)
        if m and "{" in _strip_code_line(line):
            impl_ctx.append((m.group(1), _brace_end(lines, lineno)))
            i += 1
            continue
        m = _RUST_FN_RE.match(line)
        if m:
            name = m.group(1)
            end = _brace_end(lines, lineno)
            body = "\n".join(lines[lineno - 1:end])
            parent = impl_ctx[-1][0] if impl_ctx else None
            units.append((
                path, name, f"{parent}.{name}" if parent else name,
                "Method" if parent else "Function", lineno, end,
                line.strip(), _doc_above(lines, lineno, "rust"),
                _params_rust(line), parent, _calls_in(body, name), body, "rust",
            ))
            i = end
            continue
        m = _RUST_TYPE_RE.match(line)
        if m:
            name = m.group(1)
            end = _brace_end(lines, lineno)
            body = "\n".join(lines[lineno - 1:end])
            units.append((
                path, name, name, "Class", lineno, end, line.strip(),
                _doc_above(lines, lineno, "rust"), [], None,
                _calls_in(body, name), body, "rust",
            ))
            i = end
            continue
        m = _RUST_CONST_RE.match(line)
        if m and not impl_ctx:
            end = _brace_end(lines, lineno) if "{" in _strip_code_line(line) else lineno
            units.append((
                path, m.group(1), m.group(1), "Constant", lineno, end, None,
                _doc_above(lines, lineno, "rust"), [], None, [],
                "\n".join(lines[lineno - 1:end]), "rust",
            ))
        i += 1
    return units


def _parse_js(path: str, content: str) -> list[tuple]:
    lines = (content or "").splitlines()
    units: list[tuple] = []
    class_ctx: list[tuple[str, int]] = []
    i = 0
    while i < len(lines):
        lineno = i + 1
        line = lines[i]
        while class_ctx and lineno > class_ctx[-1][1]:
            class_ctx.pop()
        m = _JS_CLASS_RE.match(line)
        if m:
            name = m.group(1)
            end = _brace_end(lines, lineno)
            body = "\n".join(lines[lineno - 1:end])
            units.append((
                path, name, name, "Class", lineno, end, line.strip(),
                _doc_above(lines, lineno, "js"), [], None,
                _calls_in(body, name), body, "javascript",
            ))
            class_ctx.append((name, end))
            i += 1
            continue
        m = _JS_FN_RE.match(line) or _JS_FNEXPR_RE.match(line) or _JS_ARROW_RE.match(line)
        if m and not class_ctx:
            name = m.group(1)
            end = _brace_end(lines, lineno)
            body = "\n".join(lines[lineno - 1:end])
            units.append((
                path, name, name, "Function", lineno, end, line.strip(),
                _doc_above(lines, lineno, "js"), _params_js(line), None,
                _calls_in(body, name), body, "javascript",
            ))
            i = end
            continue
        if class_ctx:
            m = _JS_METHOD_RE.match(line)
            if m and m.group(1) not in _JS_KEYWORD_NOT_METHOD:
                name, parent = m.group(1), class_ctx[-1][0]
                end = _brace_end(lines, lineno)
                body = "\n".join(lines[lineno - 1:end])
                units.append((
                    path, name, f"{parent}.{name}", "Method", lineno, end,
                    line.strip(), _doc_above(lines, lineno, "js"),
                    _params_js(line), parent, _calls_in(body, name), body,
                    "javascript",
                ))
                i = end
                continue
        m = _JS_CONST_RE.match(line)
        if m and not class_ctx and not _JS_ARROW_RE.match(line) \
                and not _JS_FNEXPR_RE.match(line):
            units.append((
                path, m.group(1), m.group(1), "Constant", lineno, lineno, None,
                _doc_above(lines, lineno, "js"), [], None, [],
                line.strip(), "javascript",
            ))
        i += 1
    return units


_EXT_PARSERS = {
    ".rs": ("rust", _parse_rust),
    ".js": ("javascript", _parse_js),
    ".mjs": ("javascript", _parse_js),
    ".jsx": ("javascript", _parse_js),
}


def _parse_one(path: str, content: str) -> list[tuple]:
    for ext, (lang, parser) in _EXT_PARSERS.items():
        if path.endswith(ext):
            units = parser(path, content)
            if units:
                return units
            lines = (content or "").count("\n") + 1
            return [(path, path.rsplit("/", 1)[-1], path, "RawCode", 1, lines,
                     None, None, [], None, [], content, lang)]
    if not path.endswith(".py"):
        lines = (content or "").count("\n") + 1
        return [(path, path.rsplit("/", 1)[-1], path, "RawCode", 1, lines,
                 None, None, [], None, [], content, "unknown")]
    try:
        tree = ast.parse(content)
    except SyntaxError:
        lines = (content or "").count("\n") + 1
        return [(path, path.rsplit("/", 1)[-1], path, "RawCode", 1, lines,
                 None, None, [], None, [], content, "python")]
    src_lines = content.splitlines()

    def body(node) -> str:
        return "\n".join(src_lines[node.lineno - 1 : node.end_lineno])

    units: list[tuple] = []

    def visit(node, parent_class: str | None, prefix: str):
        for child in ast.iter_child_nodes(node):
            if isinstance(child, (ast.FunctionDef, ast.AsyncFunctionDef)):
                qn = f"{prefix}{child.name}"
                units.append((
                    path, child.name, qn,
                    "Method" if parent_class else "Function",
                    child.lineno, child.end_lineno, _signature(child),
                    ast.get_docstring(child), [a.arg for a in child.args.args],
                    parent_class, _calls_of(child), body(child), "python",
                ))
                visit(child, parent_class, qn + ".")
            elif isinstance(child, ast.ClassDef):
                qn = f"{prefix}{child.name}"
                units.append((
                    path, child.name, qn, "Class", child.lineno,
                    child.end_lineno, None, ast.get_docstring(child), [],
                    parent_class, _calls_of(child), body(child), "python",
                ))
                visit(child, child.name, qn + ".")
            elif isinstance(child, ast.Assign) and parent_class is None:
                for t in child.targets:
                    if isinstance(t, ast.Name) and t.id.isupper():
                        units.append((
                            path, t.id, f"{prefix}{t.id}", "Constant",
                            child.lineno, child.end_lineno, None, None, [],
                            None, [], body(child), "python",
                        ))

    visit(tree, None, "")
    return units


def parse_code_units(files: DataFrame, *, path_col: str = "path",
                     content_col: str = "content") -> DataFrame:
    """files(path, content) → code_units rows (one per function/method/
    class/constant), with a stable ``unit_id`` assigned afterwards by the
    caller if needed. Arrow-batched; each Python worker parses a batch of
    whole files."""
    def run(batches):
        import pandas as pd

        cols = [f.split(" ")[0] for f in UNITS_OUT_SCHEMA.split(", ")]
        for pdf in batches:
            rows: list[tuple] = []
            for r in pdf.itertuples(index=False):
                rows.extend(_parse_one(getattr(r, path_col), getattr(r, content_col)))
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(run, schema=UNITS_OUT_SCHEMA)


def with_unit_ids(units: DataFrame) -> DataFrame:
    """Deterministic unit_id: dense rank over (file, line, name)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = Window.orderBy("file", "line", "name")
    return units.withColumn("unit_id", F.row_number().over(w).cast("long") - 1)

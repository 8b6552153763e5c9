"""Code-unit extraction — P1 (SURVEY.md §2.7).

The reference parses 25+ languages with tree-sitter
(colgrep/src/parser/extract.rs:1-825) into CodeUnit rows. py-tree-sitter is
not in this container, so:

- Python is parsed for real with the stdlib ``ast`` module (functions /
  methods / classes with signature, docstring, params, calls, line spans —
  the FIXTURES.md §6 column contract);
- Rust, JavaScript, TypeScript, Go, Java, C#, C, C++, PHP and Ruby get an
  ast-lite line scanner (doc-comment capture, brace- or ``end``-matched
  spans, impl/class method contexts) matching the unit shapes asserted in
  colgrep/src/parser/tests/test_{rust,javascript,typescript,go,java,
  csharp,c,cpp,php,ruby}.rs;
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
    r"^\s*(?:public\s+|private\s+|protected\s+|readonly\s+)*(?:static\s+)?"
    r"(?:async\s+)?(?:get\s+|set\s+)?\*?\s*"
    r"([A-Za-z_$][A-Za-z0-9_$]*)\s*\([^)]*\)\s*(?::\s*[^{;=]+)?\{"
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
        # drop default values and TS type annotations: "id: number = 3"
        name = part.strip().split("=")[0].split(":")[0].strip().lstrip(".?")
        if re.fullmatch(r"[A-Za-z_$][A-Za-z0-9_$]*", name):
            out.append(name)
    return out


def _doc_above(lines: list[str], start: int, kind: str) -> str | None:
    """Doc comment ending on the line above ``start`` (1-based).

    kind='rust': contiguous /// or //! lines; kind='line': contiguous //
    lines (Go, C fallback); kind='hash': contiguous # lines (Ruby);
    kind='js': a /** … */ block (also tried first for C-family).
    Joined with spaces the way the reference flattens them."""
    i = start - 2
    if kind in ("rust", "line", "hash"):
        pat = {"rust": r"\s*//[/!]", "line": r"\s*//(?!/)", "hash": r"\s*#"}[kind]
        strip_pat = {"rust": r"\s*//[/!]\s?", "line": r"\s*//\s?",
                     "hash": r"\s*#\s?"}[kind]
        doc: list[str] = []
        while i >= 0 and re.match(pat, lines[i]):
            doc.append(re.sub(strip_pat, "", lines[i]).strip())
            i -= 1
        if doc:
            return " ".join(x for x in reversed(doc)).strip() or None
        return None
    if i >= 0 and lines[i].strip().endswith("*/"):
        doc = []
        while i >= 0:
            t = lines[i].strip()
            doc.append(re.sub(r"\s*\*+/$|^/?\*+\s?", "", t).strip())
            if t.startswith("/**") or t.startswith("/*"):
                break
            i -= 1
        return " ".join(x for x in reversed(doc) if x).strip() or None
    return None


def _doc_c_family(lines: list[str], start: int) -> str | None:
    """Javadoc-style block if present, else contiguous // lines."""
    return _doc_above(lines, start, "js") or _doc_above(lines, start, "line")


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


# -- TypeScript (JS machinery + type-annotation tolerance) ----------------------

_TS_IFACE_RE = re.compile(
    r"^\s*(?:export\s+)?(?:declare\s+)?(?:const\s+)?(?:abstract\s+)?"
    r"(?:interface|enum)\s+([A-Za-z_$][A-Za-z0-9_$]*)"
)
_TS_ALIAS_RE = re.compile(
    r"^\s*(?:export\s+)?type\s+([A-Za-z_$][A-Za-z0-9_$]*)(?:<[^>]*>)?\s*="
)
_TS_ARROW_RE = re.compile(
    r"^\s*(?:export\s+)?(?:const|let|var)\s+([A-Za-z_$][A-Za-z0-9_$]*)"
    r"(?:\s*:\s*[^=]+?)?\s*=\s*(?:async\s*)?"
    r"(?:\([^)]*\)\s*(?::\s*[^=>{]+?)?|[A-Za-z_$][A-Za-z0-9_$]*)\s*=>"
)


def _parse_ts(path: str, content: str) -> list[tuple]:
    lines = (content or "").splitlines()
    units = _parse_js(path, content)
    units = [u[:12] + ("typescript",) for u in units]
    seen = {(u[1], u[4]) for u in units}
    for i, line in enumerate(lines):
        lineno = i + 1
        m = _TS_IFACE_RE.match(line)
        if m and (m.group(1), lineno) not in seen:
            end = _brace_end(lines, lineno)
            units.append((
                path, m.group(1), m.group(1), "Class", lineno, end,
                line.strip(), _doc_above(lines, lineno, "js"), [], None, [],
                "\n".join(lines[lineno - 1:end]), "typescript",
            ))
            continue
        m = _TS_ALIAS_RE.match(line)
        if m and (m.group(1), lineno) not in seen:
            end = _brace_end(lines, lineno) if "{" in _strip_code_line(line) \
                else lineno
            units.append((
                path, m.group(1), m.group(1), "Class", lineno, end,
                line.strip(), _doc_above(lines, lineno, "js"), [], None, [],
                "\n".join(lines[lineno - 1:end]), "typescript",
            ))
            continue
        m = _TS_ARROW_RE.match(line)
        if m and (m.group(1), lineno) not in seen:
            end = _brace_end(lines, lineno)
            body = "\n".join(lines[lineno - 1:end])
            units.append((
                path, m.group(1), m.group(1), "Function", lineno, end,
                line.strip(), _doc_above(lines, lineno, "js"),
                _params_js(line), None, _calls_in(body, m.group(1)), body,
                "typescript",
            ))
    units.sort(key=lambda u: u[4])
    return units


# -- Go -------------------------------------------------------------------------

_GO_FUNC_RE = re.compile(
    r"^func\s+(?:\((?P<recv>[^)]*)\)\s*)?(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s*\("
)
_GO_TYPE_RE = re.compile(
    r"^type\s+([A-Za-z_][A-Za-z0-9_]*)\s+(?:struct|interface)\b"
)
_GO_CONST_RE = re.compile(r"^(?:const|var)\s+([A-Za-z_][A-Za-z0-9_]*)\s*[=\s]")


def _paren_group(line: str, open_idx: int) -> str:
    """Contents of the paren group opening at ``line[open_idx]`` == '('."""
    depth = 0
    for j in range(open_idx, len(line)):
        if line[j] == "(":
            depth += 1
        elif line[j] == ")":
            depth -= 1
            if depth == 0:
                return line[open_idx + 1:j]
    return line[open_idx + 1:]


def _params_go(arglist: str) -> list[str]:
    """Go params group like ``a, b int, c *Foo`` → first identifier of each
    comma part (grouped params share a type; names come first)."""
    out = []
    depth = 0
    part = []
    parts: list[str] = []
    for ch in arglist:
        if ch in "([{":
            depth += 1
        elif ch in ")]}":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(part))
            part = []
        else:
            part.append(ch)
    parts.append("".join(part))
    for p in parts:
        m = re.match(r"\s*([A-Za-z_][A-Za-z0-9_]*)", p)
        if m:
            out.append(m.group(1))
    return out


def _parse_go(path: str, content: str) -> list[tuple]:
    lines = (content or "").splitlines()
    units: list[tuple] = []
    i = 0
    while i < len(lines):
        lineno = i + 1
        line = lines[i]
        m = _GO_FUNC_RE.match(line)
        if m:
            name = m.group("name")
            recv = m.group("recv")
            parent = None
            if recv:
                # receiver like ``c *Calculator`` → parent Calculator
                toks = recv.replace("*", " ").split()
                parent = toks[-1] if toks else None
            end = _brace_end(lines, lineno)
            body = "\n".join(lines[lineno - 1:end])
            params = _params_go(_paren_group(line, m.end() - 1))
            units.append((
                path, name, f"{parent}.{name}" if parent else name,
                "Method" if parent else "Function", lineno, end,
                line.strip(), _doc_above(lines, lineno, "line"),
                params, parent, _calls_in(body, name), body, "go",
            ))
            i = end
            continue
        m = _GO_TYPE_RE.match(line)
        if m:
            end = _brace_end(lines, lineno)
            body = "\n".join(lines[lineno - 1:end])
            units.append((
                path, m.group(1), m.group(1), "Class", lineno, end,
                line.strip(), _doc_above(lines, lineno, "line"), [], None,
                _calls_in(body, m.group(1)), body, "go",
            ))
            i = end
            continue
        m = _GO_CONST_RE.match(line)
        if m and m.group(1) not in ("func", "type"):
            units.append((
                path, m.group(1), m.group(1), "Constant", lineno, lineno,
                None, _doc_above(lines, lineno, "line"), [], None, [],
                line.strip(), "go",
            ))
        i += 1
    return units


# -- Java / C# (class-scanned; methods ALSO emitted as separate units,
#    per colgrep/src/parser/tests/test_java.rs "Methods are extracted as
#    separate units alongside their parent classes") ---------------------------

_JAVALIKE_CLASS_RE = re.compile(
    r"^\s*(?:@[\w.]+(?:\([^)]*\))?\s+)*"
    r"(?:(?:public|private|protected|internal|static|final|abstract|sealed|"
    r"partial|strictfp)\s+)*"
    r"(?:class|interface|enum|record|struct)\s+([A-Za-z_$][A-Za-z0-9_$]*)"
)
_JAVALIKE_METHOD_RE = re.compile(
    r"^\s*(?:@[\w.]+(?:\([^)]*\))?\s+)*"
    r"(?:(?:public|private|protected|internal|static|final|abstract|"
    r"synchronized|native|default|virtual|override|async|sealed|partial|"
    r"extern|new|unsafe|strictfp)\s+)*"
    r"(?:<[^>]+>\s+)?"
    r"(?:[A-Za-z_$][\w.<>\[\],?$ ]*?\s+)?"
    r"([A-Za-z_$][A-Za-z0-9_$]*)\s*\(([^)]*)\)\s*"
    r"(?:throws\s+[\w.,\s]+)?\s*\{"
)
_JAVALIKE_KEYWORDS = frozenset(
    "if for while switch catch return new else do try synchronized using "
    "lock foreach".split()
)
_JAVALIKE_CONST_RE = re.compile(
    r"^\s*(?:(?:public|private|protected|internal)\s+)?"
    r"(?:static\s+final|final\s+static|const|static\s+readonly)\s+"
    r"[\w.<>\[\],?$ ]+?\s+([A-Z_][A-Z0-9_]*)\s*="
)


def _params_javalike(arglist: str) -> list[str]:
    out = []
    for part in arglist.split(","):
        part = re.sub(r"<[^>]*>", "", part).split("=")[0].strip()
        if not part or part == "void":
            continue
        toks = part.replace("...", " ").split()
        if toks:
            name = toks[-1].lstrip("&*")
            if re.fullmatch(r"[A-Za-z_$][A-Za-z0-9_$]*", name):
                out.append(name)
    return out


def _parse_javalike(path: str, content: str, lang: str) -> list[tuple]:
    lines = (content or "").splitlines()
    units: list[tuple] = []
    class_ctx: list[tuple[str, int]] = []
    i = 0
    while i < len(lines):
        lineno = i + 1
        line = lines[i]
        while class_ctx and lineno > class_ctx[-1][1]:
            class_ctx.pop()
        m = _JAVALIKE_CLASS_RE.match(line)
        if m:
            name = m.group(1)
            end = _brace_end(lines, lineno)
            body = "\n".join(lines[lineno - 1:end])
            parent = class_ctx[-1][0] if class_ctx else None
            units.append((
                path, name, f"{parent}.{name}" if parent else name, "Class",
                lineno, end, line.strip(), _doc_c_family(lines, lineno), [],
                parent, _calls_in(body, name), body, lang,
            ))
            class_ctx.append((name, end))
            i += 1
            continue
        if class_ctx:
            m = _JAVALIKE_METHOD_RE.match(line)
            if m and m.group(1) not in _JAVALIKE_KEYWORDS:
                name, parent = m.group(1), class_ctx[-1][0]
                end = _brace_end(lines, lineno)
                body = "\n".join(lines[lineno - 1:end])
                units.append((
                    path, name, f"{parent}.{name}", "Method", lineno, end,
                    line.strip(), _doc_c_family(lines, lineno),
                    _params_javalike(m.group(2)), parent,
                    _calls_in(body, name), body, lang,
                ))
                i = end
                continue
            m = _JAVALIKE_CONST_RE.match(line)
            if m:
                units.append((
                    path, m.group(1), f"{class_ctx[-1][0]}.{m.group(1)}",
                    "Constant", lineno, lineno, None,
                    _doc_c_family(lines, lineno), [], class_ctx[-1][0], [],
                    line.strip(), lang,
                ))
        i += 1
    return units


# -- C / C++ --------------------------------------------------------------------

_C_TYPE_RE = re.compile(
    r"^\s*(?:typedef\s+)?(?:struct|class|enum|union)\s+"
    r"([A-Za-z_][A-Za-z0-9_]*)\s*(?::[^{]*)?\{?"
)
_C_DEFINE_RE = re.compile(r"^\s*#\s*define\s+([A-Za-z_][A-Za-z0-9_]*)")
# prefix (return type + qualifiers), if present, must END with a separator
# so it can never swallow the head of the function name
_C_FUNC_RE = re.compile(
    r"^(?P<prefix>[A-Za-z_][\w<>,:\s\*&~\[\]]*?[\s\*&:])?"
    r"(?P<name>~?[A-Za-z_][A-Za-z0-9_]*)\s*\("
)
_C_SCOPE_RE = re.compile(r"([A-Za-z_][A-Za-z0-9_]*)\s*::\s*$")
_C_KEYWORDS = frozenset(
    "if for while switch return sizeof case do else goto defined "
    "catch throw new delete static_assert".split()
)


def _opens_block(lines: list[str], idx: int) -> bool:
    """True if a ``{`` opens before any ``;`` within 3 lines of idx
    (0-based) — i.e. this is a definition, not a declaration/call."""
    for j in range(idx, min(idx + 3, len(lines))):
        s = _strip_code_line(lines[j])
        bi, si = s.find("{"), s.find(";")
        if bi >= 0 and (si < 0 or bi < si):
            return True
        if si >= 0:
            return False
    return False


def _parse_c(path: str, content: str, lang: str) -> list[tuple]:
    lines = (content or "").splitlines()
    units: list[tuple] = []
    class_ctx: list[tuple[str, int]] = []
    i = 0
    while i < len(lines):
        lineno = i + 1
        line = lines[i]
        while class_ctx and lineno > class_ctx[-1][1]:
            class_ctx.pop()
        stripped = line.strip()
        m = _C_DEFINE_RE.match(line)
        if m:
            units.append((
                path, m.group(1), m.group(1), "Constant", lineno, lineno,
                None, _doc_c_family(lines, lineno), [], None, [],
                stripped, lang,
            ))
            i += 1
            continue
        m = _C_TYPE_RE.match(line)
        if m and _opens_block(lines, i):
            name = m.group(1)
            end = _brace_end(lines, lineno)
            body = "\n".join(lines[lineno - 1:end])
            units.append((
                path, name, name, "Class", lineno, end, stripped,
                _doc_c_family(lines, lineno), [], None,
                _calls_in(body, name), body, lang,
            ))
            if lang == "cpp":
                class_ctx.append((name, end))
                i += 1
            else:
                i = end
            continue
        if (stripped and not stripped.startswith(("#", "//", "*", "/*", "}"))
                and "(" in stripped):
            m = _C_FUNC_RE.match(stripped)
            if m:
                name = m.group("name")
                sm = _C_SCOPE_RE.search(m.group("prefix") or "")
                scope = sm.group(1) if sm else None
                if name not in _C_KEYWORDS and _opens_block(lines, i):
                    parent = scope or (class_ctx[-1][0] if class_ctx else None)
                    end = _brace_end(lines, lineno)
                    body = "\n".join(lines[lineno - 1:end])
                    args = _paren_group(
                        stripped, stripped.find("(", stripped.find(name)))
                    units.append((
                        path, name,
                        f"{parent}.{name}" if parent else name,
                        "Method" if parent else "Function", lineno, end,
                        stripped, _doc_c_family(lines, lineno),
                        _params_javalike(args), parent,
                        _calls_in(body, name), body, lang,
                    ))
                    i = end
                    continue
        i += 1
    return units


# -- PHP ------------------------------------------------------------------------

_PHP_FN_RE = re.compile(
    r"^\s*(?:(?:public|private|protected|static|final|abstract)\s+)*"
    r"function\s+&?([A-Za-z_][A-Za-z0-9_]*)\s*\(([^)]*)\)"
)
_PHP_CLASS_RE = re.compile(
    r"^\s*(?:final\s+|abstract\s+)?(?:class|interface|trait|enum)\s+"
    r"([A-Za-z_][A-Za-z0-9_]*)"
)
_PHP_CONST_RE = re.compile(r"^\s*const\s+([A-Z_][A-Z0-9_]*)\s*=")


def _params_php(arglist: str) -> list[str]:
    return re.findall(r"\$([A-Za-z_][A-Za-z0-9_]*)", arglist)


def _parse_php(path: str, content: str) -> list[tuple]:
    lines = (content or "").splitlines()
    units: list[tuple] = []
    class_ctx: list[tuple[str, int]] = []
    i = 0
    while i < len(lines):
        lineno = i + 1
        line = lines[i]
        while class_ctx and lineno > class_ctx[-1][1]:
            class_ctx.pop()
        m = _PHP_CLASS_RE.match(line)
        if m:
            name = m.group(1)
            end = _brace_end(lines, lineno)
            body = "\n".join(lines[lineno - 1:end])
            units.append((
                path, name, name, "Class", lineno, end, line.strip(),
                _doc_c_family(lines, lineno), [], None,
                _calls_in(body, name), body, "php",
            ))
            class_ctx.append((name, end))
            i += 1
            continue
        m = _PHP_FN_RE.match(line)
        if m:
            name = m.group(1)
            parent = class_ctx[-1][0] if class_ctx else None
            end = _brace_end(lines, lineno)
            body = "\n".join(lines[lineno - 1:end])
            units.append((
                path, name, f"{parent}.{name}" if parent else name,
                "Method" if parent else "Function", lineno, end,
                line.strip(), _doc_c_family(lines, lineno),
                _params_php(m.group(2)), parent, _calls_in(body, name),
                body, "php",
            ))
            i = end
            continue
        m = _PHP_CONST_RE.match(line)
        if m:
            parent = class_ctx[-1][0] if class_ctx else None
            units.append((
                path, m.group(1),
                f"{parent}.{m.group(1)}" if parent else m.group(1),
                "Constant", lineno, lineno, None,
                _doc_c_family(lines, lineno), [], parent, [],
                line.strip(), "php",
            ))
        i += 1
    return units


# -- Ruby (end-matched blocks) --------------------------------------------------

_RUBY_DEF_RE = re.compile(
    r"^\s*def\s+(?:self\.)?([A-Za-z_][A-Za-z0-9_]*[?!=]?)\s*(?:\(([^)]*)\))?"
)
_RUBY_CLASS_RE = re.compile(r"^\s*(?:class|module)\s+([A-Z][A-Za-z0-9_]*)")
_RUBY_CONST_RE = re.compile(r"^\s*([A-Z][A-Z0-9_]*)\s*=")
_RUBY_OPENER_RE = re.compile(
    r"^\s*(?:module|class|def|if|unless|case|while|until|for|begin)\b"
)
_RUBY_DO_RE = re.compile(r"\bdo\s*(?:\|[^|]*\|)?\s*(?:#.*)?$")


def _ruby_end(lines: list[str], start: int) -> int:
    """1-based end line of the block opened at lines[start-1]."""
    first = lines[start - 1].split("#", 1)[0]
    if re.search(r"\bend\b\s*$", first):
        return start  # one-liner: def foo; x; end
    depth = 1
    for i in range(start, len(lines)):
        code = lines[i].split("#", 1)[0]
        s = code.strip()
        if _RUBY_OPENER_RE.match(code) or _RUBY_DO_RE.search(code):
            # `x = 1 if y` modifier forms don't start the line, so this
            # only counts real block openers
            depth += 1
        if s == "end" or s.startswith(("end ", "end.", "end;")):
            depth -= 1
            if depth == 0:
                return i + 1
    return len(lines)


def _parse_ruby(path: str, content: str) -> list[tuple]:
    lines = (content or "").splitlines()
    units: list[tuple] = []
    class_ctx: list[tuple[str, int]] = []
    i = 0
    while i < len(lines):
        lineno = i + 1
        line = lines[i]
        while class_ctx and lineno > class_ctx[-1][1]:
            class_ctx.pop()
        m = _RUBY_CLASS_RE.match(line)
        if m:
            name = m.group(1)
            end = _ruby_end(lines, lineno)
            body = "\n".join(lines[lineno - 1:end])
            parent = class_ctx[-1][0] if class_ctx else None
            units.append((
                path, name, f"{parent}.{name}" if parent else name, "Class",
                lineno, end, line.strip(), _doc_above(lines, lineno, "hash"),
                [], parent, _calls_in(body, name), body, "ruby",
            ))
            class_ctx.append((name, end))
            i += 1
            continue
        m = _RUBY_DEF_RE.match(line)
        if m:
            name = m.group(1)
            parent = class_ctx[-1][0] if class_ctx else None
            end = _ruby_end(lines, lineno)
            body = "\n".join(lines[lineno - 1:end])
            params = [
                p.split("=")[0].strip().lstrip("*&:")
                for p in (m.group(2) or "").split(",") if p.strip()
            ]
            units.append((
                path, name, f"{parent}.{name}" if parent else name,
                "Method" if parent else "Function", lineno, end,
                line.strip(), _doc_above(lines, lineno, "hash"),
                [p for p in params if p], parent, _calls_in(body, name),
                body, "ruby",
            ))
            i = end
            continue
        m = _RUBY_CONST_RE.match(line)
        if m:
            parent = class_ctx[-1][0] if class_ctx else None
            units.append((
                path, m.group(1),
                f"{parent}.{m.group(1)}" if parent else m.group(1),
                "Constant", lineno, lineno, None,
                _doc_above(lines, lineno, "hash"), [], parent, [],
                line.strip(), "ruby",
            ))
        i += 1
    return units


_EXT_PARSERS = {
    ".rs": ("rust", _parse_rust),
    ".js": ("javascript", _parse_js),
    ".mjs": ("javascript", _parse_js),
    ".jsx": ("javascript", _parse_js),
    ".ts": ("typescript", _parse_ts),
    ".tsx": ("typescript", _parse_ts),
    ".mts": ("typescript", _parse_ts),
    ".go": ("go", _parse_go),
    ".java": ("java", lambda p, c: _parse_javalike(p, c, "java")),
    ".cs": ("csharp", lambda p, c: _parse_javalike(p, c, "csharp")),
    ".c": ("c", lambda p, c: _parse_c(p, c, "c")),
    ".h": ("c", lambda p, c: _parse_c(p, c, "c")),
    ".cpp": ("cpp", lambda p, c: _parse_c(p, c, "cpp")),
    ".cc": ("cpp", lambda p, c: _parse_c(p, c, "cpp")),
    ".hpp": ("cpp", lambda p, c: _parse_c(p, c, "cpp")),
    ".cxx": ("cpp", lambda p, c: _parse_c(p, c, "cpp")),
    ".php": ("php", _parse_php),
    ".rb": ("ruby", _parse_ruby),
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

"""Code-unit extraction — P1 (SURVEY.md §2.7).

The reference parses 25+ languages with tree-sitter
(colgrep/src/parser/extract.rs:1-825) into CodeUnit rows. py-tree-sitter is
not in this container, so Python sources are parsed for real with the
stdlib ``ast`` module (functions/methods/classes with signature, docstring,
params, calls, line spans — the FIXTURES.md §6 column contract); other
languages fall through to a whole-file RawCode unit. Swapping in
tree-sitter later only replaces ``_parse_one`` — the distributed shape
(``mapInPandas`` over (path, content) rows) is the operator.
"""

from __future__ import annotations

import ast

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


def _parse_one(path: str, content: str) -> list[tuple]:
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

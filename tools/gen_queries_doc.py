"""Generate QUERIES.md — the full driver-contract surface in one table:
every `queries()` entry, its oracle status, and the first docstring line.
Regenerate after adding entries: python tools/gen_queries_doc.py
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    lines = [
        "# QUERIES — the `__spark_entry__` correctness surface",
        "",
        f"{len(qs)} entries; {len(oracles)} DuckDB hash-checked (*oracle*), "
        f"{len(qs) - len(oracles)} rows-only. Since r8 the approximate ANN "
        "entries are hash-checked too (trusted-artifact sidecars + "
        "deterministic folds — the funnel treatment), so the whole surface "
        "is value-verified.",
        "",
        "| entry | gate | what it pins |",
        "|---|---|---|",
    ]
    for name, fn in qs.items():
        gate = "oracle" if name in oracles else "rows"
        doc = (fn.__doc__ or "").strip().splitlines()
        first = doc[0].strip() if doc else ""
        # join wrapped first sentence
        if doc and not first.endswith("."):
            for cont in doc[1:3]:
                cont = cont.strip()
                if not cont:
                    break
                first += " " + cont
                if first.endswith("."):
                    break
        lines.append(f"| `{name}` | {gate} | {first} |")
    out = "\n".join(lines) + "\n"
    with open(os.path.join(REPO, "QUERIES.md"), "w") as f:
        f.write(out)
    print(f"wrote QUERIES.md ({len(qs)} entries)")


if __name__ == "__main__":
    main()

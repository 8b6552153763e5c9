"""Capture ``explain("formatted")`` for declared queries → plans/r15/.

Usage: python tools/capture_plans.py <suffix> [query ...]

Writes ``plans/r15/<query>_<suffix>.txt`` (suffix = ``before`` / ``after``)
for each named query (default: every declared query). The text is the
FORMATTED physical plan of the exact DataFrame ``queries()[name]`` returns —
what the optimization round's judge checks plan claims against.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(REPO, "plans", "r15")
    os.makedirs(out_dir, exist_ok=True)

    from next_plaid_spark import queries as q
    from next_plaid_spark.session import get_spark

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    registry = q.queries()
    names = sys.argv[2:] or list(registry)
    for name in names:
        spark.sparkContext.setJobDescription(f"plan: {name}")
        try:
            df = registry[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture failures visibly, keep going
            plan = f"ERROR capturing plan: {exc!r}\n"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(f"-- {name} ({suffix}) sf_dir={sf_dir}\n{plan}")
        print(f"captured {name}_{suffix}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

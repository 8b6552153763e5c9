"""Same-session A/B of CodeIndex.search single-query wall (r15 item 4).

Builds/loads the sf0.1 code index sidecar once, then times N repeated
single-query searches (forced with the noop sink) — the construction-time
driver round-trips dominate this entry, so repeated warm calls isolate the
leg-overlap effect. Usage: python tools/ab_code_search_r15.py [n]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from next_plaid_spark import queries as q
    from next_plaid_spark.session import get_spark

    spark = get_spark("ab-code-search-r15")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    t0 = time.time()
    idx = q._code_index(spark, sf_dir)
    print(f"index ready in {time.time()-t0:.2f}s")
    text = q._code_query_text(spark, sf_dir)
    walls = []
    for i in range(n):
        t0 = time.time()
        idx.search(text, top_k=5).write.mode("overwrite").format("noop").save()
        walls.append(time.time() - t0)
    print("search walls:", [round(w, 2) for w in walls])
    walls2 = []
    for i in range(n):
        t0 = time.time()
        idx.search(text, top_k=5, include_glob="src/*",
                   regex="def fn_").write.mode("overwrite").format("noop").save()
        walls2.append(time.time() - t0)
    print("filtered walls:", [round(w, 2) for w in walls2])
    return 0


if __name__ == "__main__":
    sys.exit(main())

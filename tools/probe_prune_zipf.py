"""MaxScore prune on its TARGET workload: Zipf-skewed df, two scales.

The flat synthetic documents corpus is outside the prune's win domain
(probe_prune_keyword measured essential_frac 0.67 and corpus-sized
candidate sets there). Natural-language keyword search is Zipfian: a
query's few rare terms carry the score, its common terms flood the
postings. This probe builds such a corpus at two scales — generated
ON-CLUSTER (hash-seeded Zipf inverse-CDF per token, no driver loop) —
and times BM25 batch50 exhaustive vs pruned, 3 runs each, plus parity.

Usage: python tools/probe_prune_zipf.py [n_docs_small] [factor]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VOCAB = 20_000
DOC_LEN = 30


def main() -> None:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from pyspark.sql import functions as F

    from next_plaid_spark.operators.bm25 import BM25Index
    from next_plaid_spark.session import get_spark

    spark = get_spark("probe-prune-zipf")
    spark.sparkContext.setLogLevel("ERROR")

    def force(df):
        try:
            df.write.format("noop").mode("overwrite").save()
        except Exception:
            df.count()

    # token = t{idx}, idx ~ Zipf(s=1) over VOCAB via inverse CDF of 1/x:
    # u uniform -> floor(exp(u * ln(VOCAB)))  (density ∝ 1/idx)
    lnv = math.log(VOCAB)

    def doc_text(id_col):
        u = lambda j: (  # noqa: E731 — uniform from a per-(doc,pos) hash
            (F.xxhash64(id_col, j) % 1_000_003 + 1_000_003) % 1_000_003
        ) / 1_000_003.0
        tok = lambda j: F.concat(  # noqa: E731
            F.lit("t"),
            F.floor(F.exp(u(j) * lnv)).cast("long").cast("string"))
        return F.concat_ws(
            " ", F.transform(F.sequence(F.lit(1), F.lit(DOC_LEN)), tok))

    # 50 queries: 2 rare terms (unique to ~1/VOCAB docs) + 4 flood terms
    qrows = [(q, f"t{VOCAB - 1 - 2 * q} t{VOCAB // 2 + 3 * q} t1 t2 t3 t4")
             for q in range(50)]
    queries = spark.createDataFrame(qrows, "query_id long, text string")

    for n_docs in (n_small, n_small * factor):
        docs = spark.range(n_docs).select(
            F.col("id").alias("doc_id"), doc_text(F.col("id")).alias("text"))
        t0 = time.time()
        bm = BM25Index.build(docs)
        bm.postings.count()  # materialize the cached postings
        bm._ensure_max_sat()
        bm.term_stats.count()  # bound table warm too (a loaded index has it)
        build_s = round(time.time() - t0, 2)

        out = {"n_docs": n_docs, "build_s": build_s}
        for mode, flag in (("exhaustive", False), ("pruned", True)):
            walls = []
            for _ in range(3):
                t0 = time.time()
                force(bm.search(queries, k=10, prune=flag))
                walls.append(round(time.time() - t0, 2))
            out[mode] = walls
        lp = getattr(bm, "_last_prune", None)
        if lp and lp.get("engaged"):
            out["candidates"] = lp.get("candidates")
            out["essential_frac"] = round(
                sum(lp["essential_terms"].values())
                / max(sum(lp["total_terms"].values()), 1), 3)
        cols = ["query_id", "doc_id", "score", "rank"]
        a = sorted(map(tuple, bm.search(queries, k=10, prune=False)
                       .select(*cols).collect()))
        b = sorted(map(tuple, bm.search(queries, k=10, prune=True)
                       .select(*cols).collect()))
        out["parity"] = "PASS" if a == b else "FAIL"
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

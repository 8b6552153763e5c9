"""r15 SCALING probe: per-update BM25 store bytes written — the tiered
``save_delta`` (r15) vs the pre-r15 full-store rewrite — over a chain of
append/change/delete updates on a synthetic corpus.

Methodology mirrors tools/ingest_bytes_r14.py: "new bytes" for a snapshot
= bytes of postings/doclens/positions files whose inode did NOT exist in
the previous snapshot (hardlinked carries are free). term_stats + meta are
reported separately — both forms rewrite them per snapshot (term_stats is
the BM25 analog of the plaid IVF re-derive: vocabulary-sized, the
per-snapshot correctness anchor for df/max_sat under the new avgdl).

Usage: python tools/bm25_bytes_r15.py [n_docs] [n_updates]
Prints one JSON line; paste the summary into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from next_plaid_spark.operators.bm25 import BM25Index, _tokenizer  # noqa: E402
from next_plaid_spark.session import get_spark  # noqa: E402

COMPONENTS = ("postings", "doclens", "positions")
DERIVED = ("term_stats",)


def _inode_bytes(root: str, names) -> dict[int, int]:
    out: dict[int, int] = {}
    for name in names:
        d = os.path.join(root, name)
        if not os.path.isdir(d):
            continue
        for f in os.listdir(d):
            if f.startswith(("_", ".")):
                continue
            st = os.stat(os.path.join(d, f))
            out[st.st_ino] = st.st_size
    return out


def _doc(i: int) -> tuple[int, str]:
    words = [f"w{(i * 7 + j) % 211}" for j in range(12)] + ["alpha", "beta"]
    return (i, " ".join(words))


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_upd = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("bm25-bytes-r15")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="bm25_bytes_r15_")

    docs = spark.createDataFrame(
        [_doc(i) for i in range(n_docs)], "doc_id long, text string")
    BM25Index.build(docs, with_positions=True).save(os.path.join(root, "v0"))

    store_bytes0 = sum(_inode_bytes(
        os.path.join(root, "v0"), COMPONENTS).values())
    per_update = []
    next_id = n_docs
    cur = os.path.join(root, "v0")
    for u in range(n_upd):
        idx = BM25Index.load(spark, cur)
        # realistic mixed update: 20 new docs, 5 re-encoded (same id, new
        # text), 5 deleted — gone = re-encoded ∪ deleted
        new_rows = [_doc(next_id + j) for j in range(20)]
        re_ids = [(u * 37 + j * 13) % n_docs for j in range(5)]
        del_ids = [(u * 53 + j * 17) % n_docs + n_docs // 2 for j in range(5)]
        del_ids = [d % n_docs for d in del_ids if d % n_docs not in re_ids]
        next_id += 20
        re_rows = [(i, _doc(i)[1] + " omega") for i in re_ids]
        newdf = spark.createDataFrame(
            new_rows + re_rows, "doc_id long, text string")
        toks = newdf.select(
            "doc_id",
            F.posexplode(_tokenizer(idx.tokenizer)(F.col("text"))).alias(
                "pos", "term"))
        out = os.path.join(root, f"v{u + 1}")
        prev_inodes = _inode_bytes(cur, COMPONENTS)
        idx.save_delta(
            out,
            gone_docs=spark.createDataFrame(
                [(i,) for i in set(re_ids) | set(del_ids)], "doc_id long"),
            post_new=toks.groupBy("term", "doc_id").agg(
                F.count("*").alias("tf")),
            dl_new=toks.groupBy("doc_id").agg(F.count("*").alias("dl")),
            pos_new=toks.select("term", "doc_id", "pos"),
        )
        now = _inode_bytes(out, COMPONENTS)
        new_bytes = sum(sz for ino, sz in now.items()
                        if ino not in prev_inodes)
        derived_bytes = sum(_inode_bytes(out, DERIVED).values())
        per_update.append({
            "update": u + 1,
            "store_bytes": sum(now.values()),
            "new_data_bytes": new_bytes,
            "derived_bytes": derived_bytes,
        })
        cur = out

    tail = per_update[-3:]
    summary = {
        "n_docs": n_docs,
        "n_updates": n_upd,
        "initial_store_bytes": store_bytes0,
        "per_update": per_update,
        "settled_new_data_bytes_avg": round(
            sum(p["new_data_bytes"] for p in tail) / len(tail)),
        "settled_new_vs_store_pct": round(
            100.0 * sum(p["new_data_bytes"] for p in tail) / len(tail)
            / per_update[-1]["store_bytes"], 2),
        "full_rewrite_equivalent_bytes": per_update[-1]["store_bytes"],
    }
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())

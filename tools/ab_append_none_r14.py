"""r14 A/B: `update_index` append path with gone=None (static pure-append,
skips the delete bookkeeping job + anti-joins) vs the prior empty-frame
`gone` (one doc_stats semi-join aggregation job + two anti-joins that
drop nothing). Same base index, alternating appends, interleaved x3.

Usage: python tools/ab_append_none_r14.py [sf_dir]   (default sf0.01)
Prints one JSON line {wall_none: [...], wall_empty: [...], jobs_none, jobs_empty}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from next_plaid_spark.encoding import encode_documents  # noqa: E402
from next_plaid_spark.operators.update import update_index_delta  # noqa: E402
from next_plaid_spark.plans.builder import IndexBuilder  # noqa: E402
from next_plaid_spark.session import get_spark  # noqa: E402


def _jobs_in_group(spark, group: str) -> int:
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(group))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("ab-append-none-r14", shuffle_partitions=8)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).cache()
    n_docs = docs.count()
    base_cut = n_docs // 2

    root = tempfile.mkdtemp(prefix="ab_append_none_")
    base = IndexBuilder(spark, nbits=4, seed=42, bucket_tokens=8).build(
        encode_documents(docs.filter(F.col("doc_id") % n_docs < base_cut)),
        f"{root}/base")

    # 6 disjoint append slices; alternate None/empty x3 rounds
    step = (n_docs - base_cut) // 6
    slices = []
    for i in range(6):
        lo = base_cut + i * step
        hi = n_docs if i == 5 else base_cut + (i + 1) * step
        slices.append(encode_documents(docs.filter(
            (F.col("doc_id") % n_docs >= lo) & (F.col("doc_id") % n_docs < hi))))

    walls: dict[str, list[float]] = {"none": [], "empty": []}
    jobs: dict[str, list[int]] = {"none": [], "empty": []}
    for i, toks in enumerate(slices):
        mode = "none" if i % 2 == 0 else "empty"
        gone = (None if mode == "none"
                else spark.createDataFrame([], "doc_id long"))
        spark.sparkContext.setJobGroup(f"leg{i}", f"append {mode}")
        t0 = time.monotonic()
        update_index_delta(spark, base, gone, toks, f"{root}/out{i}")
        walls[mode].append(round(time.monotonic() - t0, 2))
        jobs[mode].append(_jobs_in_group(spark, f"leg{i}"))
        spark.sparkContext.setJobGroup("", "")

    print(json.dumps({"wall_none": walls["none"], "wall_empty": walls["empty"],
                      "jobs_none": jobs["none"], "jobs_empty": jobs["empty"]}))


if __name__ == "__main__":
    main()

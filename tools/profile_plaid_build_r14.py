"""Stage-level profile of the headline PLAID index build (r14 opt round).

Replicates the bench's ``plaid_index_build`` timed segment (the bucketed
``q._plaid_index`` build at sf0.1) on a UI-enabled session, with stage-id
watermarks between the builder's phases, so the slow phase is measured,
not guessed.

Usage: python tools/profile_plaid_build_r14.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from next_plaid_spark import queries as q
    from tools.profile_code_index_r14 import dump_stages, next_stage_id
    from tools.profile_r14 import get_spark_ui

    spark = get_spark_ui("profile-plaid-build")
    spark.sparkContext.setLogLevel("ERROR")
    # bench-identical warmup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    warm.groupBy("source").count().collect()

    from next_plaid_spark.plans.builder import IndexBuilder

    _ = F  # parity with the other profilers' imports

    # bench parity: the timed segment is q._plaid_index = encode_documents
    # (cache fill) + bucketed IndexBuilder.build — replicate both, but on
    # a fresh temp path so the run never touches the bench's own cache
    tokens = q._doc_tokens(spark, sf_dir)

    path = os.path.join(tempfile.mkdtemp(prefix="prof_plaid_"), "index")
    buckets = int(os.environ.get("SPARK_GRAFT_BUCKET_TOKENS", "32")) or None
    lo = next_stage_id()
    t0 = time.time()
    builder = IndexBuilder(spark, nbits=4, seed=42, bucket_tokens=buckets)
    builder.build(tokens, path)
    dump_stages(lo, "encode+IndexBuilder.build (bucketed, bench-shaped)",
                time.time() - t0, top=30)


if __name__ == "__main__":
    main()

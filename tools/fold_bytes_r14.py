"""r14 SCALING probe: bytes rewritten per in-flight fold, generational
(size-tiered, r14) vs the r13 full fold, on a 20-batch stream.

Drives ``StreamingBloomDedup(vacuum_every=2)`` over 20 doc_id-sliced
batches of the sf documents table and measures, at each fold, how many
bytes the fold actually wrote (the new generation dirs that appeared
across the ``process_batch`` call). The r13 behavior — union EVERY
committed dir into one ``b-1`` — would have rewritten the ENTIRE kept
corpus at each fold; that cost is computed exactly from the same run's
dir sizes (sum of all committed kept bytes at the fold point), so the
two columns are directly comparable.

Usage: python tools/fold_bytes_r14.py [sf_dir]   (default sf0.01)
Prints one JSON line; paste the summary into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from next_plaid_spark.session import get_spark  # noqa: E402
from next_plaid_spark.streaming.curation import (  # noqa: E402
    StreamingBloomDedup,
    _dir_bytes,
)

N_BATCHES = 20
VACUUM_EVERY = 2


def _gen_sizes(kept_root: str) -> dict[str, int]:
    """Sizes of the folded dirs (generations) currently at the root."""
    if not os.path.isdir(kept_root):
        return {}
    return {
        d: _dir_bytes(os.path.join(kept_root, d))
        for d in os.listdir(kept_root)
        if d.startswith("g") or d == "b-1"
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("fold-bytes-r14", shuffle_partitions=8)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    root = tempfile.mkdtemp(prefix="fold_bytes_r14_")
    dd = StreamingBloomDedup(spark, root, threshold=0.5, n=5,
                             vacuum_every=VACUUM_EVERY)
    kept_root = dd._kept_root

    folds = []
    committed_bytes = 0  # total kept bytes on disk before the batch
    for i in range(N_BATCHES):
        before = _gen_sizes(kept_root)
        dd.process_batch(docs.filter(F.col("doc_id") % N_BATCHES == i), i)
        after = _gen_sizes(kept_root)
        new_gen_bytes = sum(sz for d, sz in after.items() if d not in before)
        if i > 0 and i % VACUUM_EVERY == 0:
            folds.append({
                "batch": i,
                "gen_bytes_rewritten": new_gen_bytes,
                "full_bytes_equiv": committed_bytes,
            })
        committed_bytes = sum(
            _dir_bytes(os.path.join(kept_root, d))
            for d in os.listdir(kept_root))

    gen_total = sum(f["gen_bytes_rewritten"] for f in folds)
    full_total = sum(f["full_bytes_equiv"] for f in folds)
    print(json.dumps({
        "sf_dir": sf_dir,
        "n_batches": N_BATCHES,
        "vacuum_every": VACUUM_EVERY,
        "n_folds": len(folds),
        "gen_total_bytes_rewritten": gen_total,
        "full_total_bytes_rewritten_r13_equiv": full_total,
        "write_amplification_ratio_full_over_gen":
            round(full_total / gen_total, 2) if gen_total else None,
        "final_kept_dirs": sorted(
            d for d in os.listdir(kept_root)
            if os.path.isdir(os.path.join(kept_root, d))),
        "folds": folds,
    }))


if __name__ == "__main__":
    main()

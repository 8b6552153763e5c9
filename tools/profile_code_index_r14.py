"""Stage-level profile of the code-index BUILD and UPDATE (r14 opt round).

Replicates the bench's code_index_build / code_index_update_2file timed
segments on a UI-enabled session and prints the top stages of each phase
(stage-id watermarks between phases), so the slow stage is measured, not
guessed.

Usage: python tools/profile_code_index_r14.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def api(path: str):
    with urllib.request.urlopen("http://localhost:4040/api/v1" + path, timeout=20) as r:
        return json.loads(r.read())


def dump_stages(lo: int, label: str, wall: float, top: int = 25) -> None:
    app_id = api("/applications")[0]["id"]
    stages = [s for s in api(f"/applications/{app_id}/stages?status=complete")
              if s["stageId"] >= lo]
    tot = sum(s.get("executorRunTime", 0) for s in stages)
    print(f"\n=== {label}: wall {wall:.2f}s | {len(stages)} stages | "
          f"executor-run {tot/1000:.1f}s ===")
    by_desc: dict = {}
    for s in stages:
        d = (s.get("description") or "?")[:40]
        agg = by_desc.setdefault(d, [0, 0, 0])
        agg[0] += s.get("executorRunTime", 0)
        agg[1] += s.get("executorCpuTime", 0)
        agg[2] += 1
    for d, (run, cpu, ns) in sorted(by_desc.items(), key=lambda kv: -kv[1][0]):
        print(f"    phase {d:<42s} run {run/1000:7.1f}s cpu {cpu/1e9:7.1f}s "
              f"{ns:3d} stages")
    for s in sorted(stages, key=lambda s: -s.get("executorRunTime", 0))[:top]:
        print(f"  st{s['stageId']:>5} {s.get('numCompleteTasks', 0):>4}t "
              f"run {s.get('executorRunTime', 0)/1000:7.2f}s "
              f"cpu {s.get('executorCpuTime', 0)/1e9:7.2f}s "
              f"in {s.get('inputBytes', 0)/1e6:7.1f}MB "
              f"shR {s.get('shuffleReadBytes', 0)/1e6:6.2f}MB "
              f"shW {s.get('shuffleWriteBytes', 0)/1e6:6.2f}MB  "
              f"{s['name'].splitlines()[0][:55]}")
        # task-time composition for run >> cpu stages (where is the wait?)
        if (s.get("executorRunTime", 0) > 5000
                and s.get("executorCpuTime", 0) / 1e6
                < 0.3 * s.get("executorRunTime", 1)):
            try:
                det = api(f"/applications/{app_id}/stages/{s['stageId']}/"
                          f"{s['attemptId']}?withSummaries=true")
                q = det.get("taskMetricsDistributions") or {}
                names = ["executorDeserializeTime", "executorRunTime",
                         "executorCpuTime", "jvmGcTime", "resultSerializationTime",
                         "schedulerDelay", "peakExecutionMemory"]
                med = {n: (q.get(n) or [0] * 5)[2] for n in names}
                print(f"        med/task: deser {med['executorDeserializeTime']:.0f}ms"
                      f" run {med['executorRunTime']:.0f}ms"
                      f" cpu {med['executorCpuTime']/1e6:.0f}ms"
                      f" gc {med['jvmGcTime']:.0f}ms"
                      f" schedDelay {med['schedulerDelay']:.0f}ms")
            except Exception as exc:
                print(f"        (no summaries: {exc})")


def next_stage_id() -> int:
    app_id = api("/applications")[0]["id"]
    sts = api(f"/applications/{app_id}/stages")
    return max((s["stageId"] for s in sts), default=-1) + 1


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from next_plaid_spark import queries as q
    from tools.profile_r14 import get_spark_ui

    spark = get_spark_ui("profile-code-index")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # phase: corpus + parse + units sidecar (the _code_units leg)
    lo = next_stage_id()
    t0 = time.time()
    units = q._code_units(spark, sf_dir)
    dump_stages(lo, "units: parse+callgraph+ids+sidecar", time.time() - t0)

    # phase: CodeIndex build from units (plaid + bm25)
    from next_plaid_spark.operators.code_index import _RAW_COLS, CodeIndex, file_state

    build_path = os.path.join(tempfile.mkdtemp(prefix="prof_ci_"), "index")
    lo = next_stage_id()
    t0 = time.time()
    buckets = int(os.environ.get("SPARK_GRAFT_BUCKET_TOKENS", "32")) or None
    ci = CodeIndex._build_from_units(
        spark, units.select(*_RAW_COLS), file_state(q._code_corpus(spark, sf_dir)),
        build_path, nbits=4, seed=42, bucket_tokens=buckets)
    dump_stages(lo, "CodeIndex._build_from_units", time.time() - t0)

    # phase: the bench's 2-file update
    files = q._code_corpus(spark, sf_dir)
    touched = [r.path for r in files.select("path").orderBy("path").limit(2).collect()]
    new_files = files.withColumn(
        "content",
        F.when(F.col("path").isin(touched),
               F.concat(F.col("content"),
                        F.lit("\ndef bench_touch():\n    return benchtouched\n"))
               ).otherwise(F.col("content")))
    upd_path = os.path.join(tempfile.mkdtemp(prefix="prof_ci_upd_"), "index")
    lo = next_stage_id()
    t0 = time.time()
    ci.update(new_files, upd_path)
    dump_stages(lo, "CodeIndex.update (2 files)", time.time() - t0, top=35)


if __name__ == "__main__":
    main()

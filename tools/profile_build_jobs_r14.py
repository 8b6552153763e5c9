"""Job-level profile of the code-index BUILD (and the plaid index build) —
maps stages to jobs so the big anonymous stages get attributed.

Usage: python tools/profile_build_jobs_r14.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.profile_update_jobs_r14 import api  # noqa: E402


def dump_jobs(jobs0: set, label: str, wall: float) -> None:
    app_id = api("/applications")[0]["id"]
    jobs = [j for j in api(f"/applications/{app_id}/jobs")
            if j["jobId"] not in jobs0]
    stages = {s["stageId"]: s for s in
              api(f"/applications/{app_id}/stages?status=complete")}
    print(f"\n=== {label}: wall {wall:.2f}s, {len(jobs)} jobs ===")
    for j in sorted(jobs, key=lambda j: j["jobId"]):
        sids = sorted(j.get("stageIds", []))
        run = sum(stages[s].get("executorRunTime", 0) for s in sids if s in stages)
        cpu = sum(stages[s].get("executorCpuTime", 0) for s in sids if s in stages)
        nt = sum(stages[s].get("numCompleteTasks", 0) for s in sids if s in stages)
        inb = sum(stages[s].get("inputBytes", 0) for s in sids if s in stages)
        if run < 1000:
            continue
        print(f"  job {j['jobId']:>4} run {run/1000:7.2f}s cpu {cpu/1e9:6.2f}s "
              f"tasks {nt:>4} in {inb/1e6:7.1f}MB stages {sids}  | "
              f"{(j.get('description') or j['name'])[:80]}")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from tools.profile_r14 import get_spark_ui

    from next_plaid_spark import queries as q

    spark = get_spark_ui("profile-build-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    app_id = api("/applications")[0]["id"]

    # plaid index build (the headline timing)
    jobs0 = {j["jobId"] for j in api(f"/applications/{app_id}/jobs")}
    t0 = time.time()
    q._plaid_index(spark, sf_dir)
    dump_jobs(jobs0, "plaid_index_build", time.time() - t0)

    # code index build
    jobs0 = {j["jobId"] for j in api(f"/applications/{app_id}/jobs")}
    t0 = time.time()
    q._code_index(spark, sf_dir)
    dump_jobs(jobs0, "code_index_build (incl. units parse)", time.time() - t0)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Job-level profile of declared queries INCLUDING construction-time jobs
(collects/localCheckpoints that run while the entry builds its DataFrame,
which the stage profiler's wall misses).

Usage: python tools/profile_query_jobs_r14.py <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.profile_update_jobs_r14 import api  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    from tools.profile_r14 import get_spark_ui

    from next_plaid_spark import queries as q

    spark = get_spark_ui("profile-query-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    warm.groupBy("source").count().collect()

    registry = q.queries()
    app_id = api("/applications")[0]["id"]
    for name in names:
        jobs0 = {j["jobId"] for j in api(f"/applications/{app_id}/jobs")}
        t0 = time.time()
        df = registry[name](spark, sf_dir)
        t_build = time.time() - t0
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        t_force = time.time() - t0
        jobs = [j for j in api(f"/applications/{app_id}/jobs")
                if j["jobId"] not in jobs0]
        stages = {s["stageId"]: s for s in
                  api(f"/applications/{app_id}/stages?status=complete")}
        print(f"\n=== {name}: build {t_build:.2f}s force {t_force:.2f}s, "
              f"{len(jobs)} jobs ===")
        for j in sorted(jobs, key=lambda j: j["jobId"]):
            sids = sorted(j.get("stageIds", []))
            run = sum(stages[s].get("executorRunTime", 0)
                      for s in sids if s in stages)
            cpu = sum(stages[s].get("executorCpuTime", 0)
                      for s in sids if s in stages)
            nt = sum(stages[s].get("numCompleteTasks", 0)
                     for s in sids if s in stages)
            mark = " *" if run > 2000 else ""
            print(f"  job {j['jobId']:>4} run {run/1000:7.2f}s cpu {cpu/1e9:6.2f}s "
                  f"tasks {nt:>4} stages {sids}  | "
                  f"{(j.get('description') or j['name'])[:70]}{mark}")
            for s in sids:
                st = stages.get(s)
                if st and st.get("executorRunTime", 0) > 2500:
                    print(f"        st{s} "
                          f"name={st['name'].splitlines()[0][:75]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

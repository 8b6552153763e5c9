"""Per-stage profile of one or more declared queries (r14 opt round).

Creates a session with the SAME engine configs as ``session.get_spark`` but
with the UI enabled, warms up like bench.py, noop-forces each named query,
then reads the UI REST API for per-stage wall, shuffle bytes, input bytes
and task counts — the guide §1/§7 measurement loop without guessing.

Usage: python tools/profile_r14.py <query> [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def get_spark_ui(app_name: str = "profile-r14"):
    os.environ["SPARK_GRAFT_UI"] = "1"
    import next_plaid_spark.session as S

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionNum", cpus)
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1b")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                os.environ.get("SPARK_GRAFT_ARROW_BATCH", "20000"))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    _ = S  # configs mirror session.get_spark; keep import for parity checks
    return builder.getOrCreate()


def api(path: str):
    base = "http://localhost:4040/api/v1"
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def stage_report(since_stage: int) -> list[dict]:
    apps = api("/applications")
    app_id = apps[0]["id"]
    stages = api(f"/applications/{app_id}/stages?status=complete")
    rows = []
    for s in stages:
        if s["stageId"] < since_stage:
            continue
        dur = s.get("executorRunTime", 0)
        rows.append({
            "stage": s["stageId"],
            "name": s["name"].split("\n")[0][:70],
            "tasks": s.get("numCompleteTasks"),
            "runtime_ms": dur,
            "cpu_ms": s.get("executorCpuTime", 0) // 1_000_000,
            "input_mb": round(s.get("inputBytes", 0) / 1e6, 1),
            "sh_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
            "sh_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
            "desc": (s.get("description") or "")[:60],
        })
    rows.sort(key=lambda r: -r["runtime_ms"])
    return rows


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    if not names:
        print("usage: profile_r14.py <query> [query ...]")
        return

    from pyspark.sql import functions as F  # noqa: F401

    from next_plaid_spark import queries as q

    spark = get_spark_ui()
    spark.sparkContext.setLogLevel("ERROR")

    # bench-identical warmup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    warm = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    warm.groupBy("source").count().collect()

    registry = q.queries()
    sc = spark.sparkContext

    for name in names:
        # build memoized indexes OUTSIDE the profiled window by constructing
        # the DataFrame first (mirrors bench.py's build-vs-query split)
        df = registry[name](spark, sf_dir)
        tracker = sc.statusTracker()
        done_before = max((sid for sid in tracker.getActiveStageIds()), default=-1)
        first_stage = len(api(f"/applications/{api('/applications')[0]['id']}/stages"))
        _ = done_before
        sc.setJobDescription(f"profile: {name}")
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        wall = time.time() - t0
        sc.setJobDescription(None)
        print(f"\n=== {name}: wall {wall:.2f} s (stages since #{first_stage}) ===")
        apps = api("/applications")
        app_id = apps[0]["id"]
        stages = api(f"/applications/{app_id}/stages?status=complete")
        newest = [s for s in stages if s.get("description") == f"profile: {name}"]
        newest.sort(key=lambda s: -s.get("executorRunTime", 0))
        tot = sum(s.get("executorRunTime", 0) for s in newest)
        print(f"{len(newest)} stages, total executor runtime {tot/1000:.2f} s")
        for s in newest[:14]:
            print(f"  st{s['stageId']:>4} {s.get('numCompleteTasks', 0):>4}t "
                  f"run {s.get('executorRunTime', 0)/1000:7.2f}s "
                  f"cpu {s.get('executorCpuTime', 0)/1e9:7.2f}s "
                  f"in {s.get('inputBytes', 0)/1e6:8.1f}MB "
                  f"shR {s.get('shuffleReadBytes', 0)/1e6:7.2f}MB "
                  f"shW {s.get('shuffleWriteBytes', 0)/1e6:7.2f}MB  "
                  f"{s['name'].splitlines()[0][:58]}")


if __name__ == "__main__":
    main()

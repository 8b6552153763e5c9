"""One-off probe: where do the batch-search Exchange occurrences live?

Builds the sf0.01 bucketed index, runs the bench-shaped batch search, and
dumps the executed plan string plus per-line Exchange occurrences, so the
r11 16/17 -> 28/29 exchange-count jump can be reconciled node by node
(VERDICT r11 watch item 1).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def _breakdown(df) -> dict:
    """Per-region exchange counts: main plan (caches as leaves) + each
    distinct cached relation's plan, counted the way it executes."""
    regions: dict[str, int] = {}
    seen: set[int] = set()

    def _seq(s):
        it, out = s.iterator(), []
        while it.hasNext():
            out.append(it.next())
        return out

    def _walk(p, region: str) -> None:
        name = p.getClass().getSimpleName()
        if name.startswith("ReusedExchange"):
            return
        regions.setdefault(region, [])
        if "Exchange" in name:
            regions[region].append(p.simpleStringWithNodeId()[:110])
        kids = _seq(p.children())
        if name.startswith("AdaptiveSparkPlan"):
            kids = [p.executedPlan()]
        elif name.endswith("QueryStageExec"):
            kids = [p.plan()]
        elif name.startswith("InMemoryTableScan"):
            cached = p.relation().cachedPlan()
            if cached.id() not in seen:
                seen.add(cached.id())
                _walk(cached, f"cache#{len(seen)}")
        for k in kids:
            _walk(k, region)

    _walk(df._jdf.queryExecution().executedPlan(), "main")
    return regions


def main(sf_dir: str = "/root/testdata/sf0.01", n_q: int = 50) -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("exchange_probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import next_plaid_spark.queries as q
    from next_plaid_spark.encoding import encode_queries
    from next_plaid_spark.plans.searcher import BatchSearcher, SearchParams

    idx = q._plaid_index(spark, sf_dir)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    batch_queries = docs.filter(F.col("doc_id") < n_q).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    searcher = BatchSearcher(idx, SearchParams(top_k=10, n_full_scores=256))
    res = searcher.search(encode_queries(batch_queries))
    res.collect()
    from bench import _exchanges as cache_aware

    print("cache_aware_exchanges:", cache_aware(res))
    print("breakdown:", _breakdown(res))

    # bucketed-is-one-fewer invariant on the FIXED counter (unbucketed A/B)
    import tempfile

    from next_plaid_spark.plans.builder import IndexBuilder

    upath = os.path.join(tempfile.mkdtemp(prefix="probe_uidx_"), "index")
    uidx = IndexBuilder(spark, nbits=4, seed=42, bucket_tokens=None).build(
        q._doc_tokens(spark, sf_dir), upath
    )
    us = BatchSearcher(uidx, SearchParams(top_k=10, n_full_scores=256))
    ures = us.search(encode_queries(batch_queries))
    ures.collect()
    print("unbucketed cache_aware:", cache_aware(ures),
          "breakdown:", _breakdown(ures))

    s = res._jdf.queryExecution().executedPlan().toString()
    with open("/tmp/exchange_probe_plan.txt", "w") as f:
        f.write(s)
    naive = s.count("Exchange") - s.count("ReusedExchange")
    print("naive_exchanges:", naive)
    print("ReusedExchange:", s.count("ReusedExchange"))
    print("InMemoryTableScan:", s.count("InMemoryTableScan"))
    print("InMemoryRelation:", s.count("InMemoryRelation"))
    print("plan lines:", len(s.splitlines()))
    for i, line in enumerate(s.splitlines()):
        if "Exchange" in line or "InMemory" in line:
            print(f"{i:4d} {line[:160]}")


if __name__ == "__main__":
    main(*sys.argv[1:2], *(int(a) for a in sys.argv[2:3]))

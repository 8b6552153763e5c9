"""Single-vector similarity search over an embedding column.

Not in the reference (its unit is the multi-vector doc), but a first-class
100 TB-pipeline operator (ANN over ``embeddings.embedding ARRAY<FLOAT>``).

- ``cosine_topk`` — brute-force exact baseline: broadcast the (small) query
  set, one shuffle for the per-query top-k window. At cluster scale the scan
  side stays fully parallel and the broadcast avoids shuffling the corpus.
- ``lsh_bucket_topk`` — scale path: random-hyperplane LSH (SimHash family)
  buckets both sides; only same-bucket pairs are scored. Recall is tunable
  via ``n_tables`` × ``n_bits``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from next_plaid_spark.functions.vector import cosine, dot, l2_normalize


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    exclude_self: bool = False,
) -> DataFrame:
    """Exact cosine top-k: returns (query_id, vec_id, cos_sim, rank).

    ``queries`` is expected to be small (it is broadcast); the corpus side
    streams. Tie-break: cos desc, vec_id asc — deterministic.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(query_vec_col).alias("_qvec"),
        )
    )
    c = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cvec"))
    pairs = c.crossJoin(q)
    if exclude_self:
        pairs = pairs.filter(F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "vec_id",
        cosine(F.col("_qvec"), F.col("_cvec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def simhash_signature(vec_col, planes: list[list[float]]):
    """Sign-bit signature of ``vec`` against fixed hyperplanes → BIGINT.

    Planes are plain Python constants (deterministic, seeded by caller), so
    the whole expression stays JVM-side.
    """
    bits = [
        F.when(dot(vec_col, F.array([F.lit(float(x)) for x in p])) >= 0, F.lit(1)).otherwise(F.lit(0))
        * F.lit(2 ** i)
        for i, p in enumerate(planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("long")


def _planes(dim: int, n_bits: int, seed: int, table: int) -> list[list[float]]:
    import numpy as np

    rng = np.random.default_rng(seed + 7919 * table)
    return rng.standard_normal((n_bits, dim)).tolist()


def lsh_bucket_assignments(
    df: DataFrame,
    *,
    dim: int,
    n_tables: int,
    n_bits: int,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hash each vector into ``n_tables`` hyperplane-LSH buckets.

    Returns an exploded DF ``(_id long, _vec array, _table int, _bucket
    long)`` — one row per (vector, table). All tables' planes are stacked
    into one ``[n_tables*n_bits, dim]`` matrix so a single GEMM per Arrow
    batch computes every signature bit (the unrolled column-expression
    variant spent more time in codegen than in compute). Shared by
    ``lsh_bucket_topk`` and ``dedup.embedding_near_dup_pairs``.
    """
    import numpy as np

    all_planes = np.concatenate(
        [np.asarray(_planes(dim, n_bits, seed, t), dtype=np.float64)
         for t in range(n_tables)]
    )
    pow2 = (1 << np.arange(n_bits)).astype(np.int64)

    def sig(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            bits = (x @ all_planes.T) >= 0  # [rows, n_tables*n_bits]
            bits = bits.reshape(len(x), n_tables, n_bits)
            buckets = (bits * pow2).sum(axis=2)  # [rows, n_tables]
            out = pd.DataFrame(
                {
                    "_id": pdf[id_col].to_numpy().repeat(n_tables),
                    "_vec": [v for v in pdf[vec_col] for _ in range(n_tables)],
                    "_table": np.tile(np.arange(n_tables), len(x)),
                    "_bucket": buckets.ravel(),
                }
            )
            yield out

    vec_type = df.schema[vec_col].dataType.simpleString()
    return df.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        sig, schema=f"_id long, _vec {vec_type}, _table int, _bucket long"
    )


def lsh_bucket_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    dim: int,
    n_tables: int = 4,
    n_bits: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """ANN cosine top-k via multi-table hyperplane LSH.

    Corpus and queries are hashed into ``n_tables`` independent bucket
    columns; candidates = union over tables of same-bucket pairs (dedup),
    then exact cosine + top-k. The bucket equi-join is an ordinary shuffle
    join on (table, bucket) — partition-parallel at any scale, no crossJoin.
    """
    c = lsh_bucket_assignments(
        embeddings, dim=dim, n_tables=n_tables, n_bits=n_bits, seed=seed,
        id_col=id_col, vec_col=vec_col)
    q = lsh_bucket_assignments(
        queries, dim=dim, n_tables=n_tables, n_bits=n_bits, seed=seed,
        id_col=query_id_col, vec_col=query_vec_col)
    cand = (
        c.join(
            q.withColumnRenamed("_id", "query_id")
            .withColumnRenamed("_vec", "_qvec"),
            on=["_table", "_bucket"],
        )
        .select("query_id", F.col("_id").alias("vec_id"), "_qvec", "_vec")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = cand.select(
        "query_id", "vec_id", cosine(F.col("_qvec"), F.col("_vec")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)

"""Sequence packing — GPT-style concat-and-chunk for LLM training data.

Documents in deterministic ``doc_id`` order are conceptually concatenated
into one token stream and cut into fixed-capacity context windows
("bins"); each document is labeled with its global token offset and the
bin range it lands in. Downstream, a writer groups by bin to emit packed
training sequences.

The core is a GLOBAL prefix sum of token counts. The naive form —
``sum() OVER (ORDER BY doc_id)`` with no PARTITION BY — collapses to a
single-partition sort at scale, so the operator computes it in two
phases (the standard distributed scan):

  1. deterministic range buckets (``doc_id // bucket_size``), per-bucket
     token totals — one map-side-combinable aggregation, |buckets| rows;
  2. the cumsum OVER the tiny bucket table (single partition over
     |buckets| ≪ |docs| rows — bounded by construction), broadcast-joined
     back, plus a within-bucket cumsum windowed BY bucket.

Every quantity is exact integer arithmetic, so results hash-match the
oracle's single-window formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from next_plaid_spark.functions.text import tokenize_unicode61


def pack_sequences(docs: DataFrame, *, capacity: int = 256,
                   bucket_size: int = 4096, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, start_off, bin_start, bin_end): the packed
    layout of each document in the concatenated token stream cut into
    ``capacity``-token bins. Documents crossing a boundary span
    ``bin_start..bin_end`` (split across windows, the usual pretraining
    treatment); empty docs occupy zero tokens at their offset."""
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(tokenize_unicode61(F.col(text_col))).cast("long").alias("n_tokens"),
    ).withColumn("bucket", F.floor(F.col("doc_id") / bucket_size))

    bucket_tot = base.groupBy("bucket").agg(F.sum("n_tokens").alias("btot"))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    bucket_pre = bucket_tot.select(
        "bucket", F.coalesce(F.sum("btot").over(w_b), F.lit(0)).alias("bucket_off")
    )

    w_in = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        base.withColumn("in_off", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)))
        .join(F.broadcast(bucket_pre), "bucket")
        .withColumn("start_off", F.col("bucket_off") + F.col("in_off"))
        .select(
            "doc_id",
            "n_tokens",
            "start_off",
            F.floor(F.col("start_off") / capacity).alias("bin_start"),
            F.floor(
                (F.col("start_off") + F.greatest(F.col("n_tokens") - 1, F.lit(0)))
                / capacity
            ).alias("bin_end"),
        )
    )
    return out


def pack_bins(docs: DataFrame, *, capacity: int = 256,
              bucket_size: int = 4096, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """(bin_id, n_tokens, tokens): the MATERIALIZED packed training
    sequences — each bin is ``capacity`` consecutive tokens of the
    concatenated corpus stream (the last bin may be short). The layout
    comes from :func:`pack_sequences`'s two-phase prefix sum; this step
    adds the per-token explode and one groupBy(bin) shuffle — the
    unavoidable materialization cost, keyed by bin so it spreads evenly
    (every bin holds exactly ``capacity`` tokens).

    Tokens carry (global_pos) through the shuffle and are reassembled in
    exact stream order via sort_array on the (pos, token) struct."""
    layout = pack_sequences(
        docs, capacity=capacity, bucket_size=bucket_size,
        id_col=id_col, text_col=text_col,
    ).select("doc_id", "start_off")
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.posexplode(tokenize_unicode61(F.col(text_col))).alias("i", "tok"),
    )
    placed = toks.join(layout, "doc_id").select(
        (F.col("start_off") + F.col("i")).alias("pos"), "tok"
    )
    return (
        placed.withColumn("bin_id", F.floor(F.col("pos") / capacity))
        .groupBy("bin_id")
        .agg(
            F.count("*").cast("int").alias("n_tokens"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ).alias("tokens"),
        )
    )


def sql_pack_bins(*, capacity: int = 256, split_re: str) -> str:
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '{split_re}'), x -> x <> '') AS toks
  FROM documents
),
cum AS (
  SELECT doc_id, toks,
         coalesce(sum(len(toks)) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
  FROM base
),
placed AS (
  SELECT start_off + i - 1 AS pos, toks[i] AS tok
  FROM cum, unnest(range(1, len(toks) + 1)) AS r(i)
)
SELECT CAST(pos // {capacity} AS BIGINT) AS bin_id,
       CAST(count(*) AS INT) AS n_tokens,
       list_transform(list_sort(list((pos, tok))), s -> s[2]) AS tokens
FROM placed
GROUP BY 1
""".strip()


def sql_pack_sequences(*, capacity: int = 256, split_re: str) -> str:
    """Oracle: the single-window formulation (fine at oracle scale; the
    Spark side exists because this is a one-partition sort at corpus
    scale)."""
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(lower(text), '{split_re}'), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
cum AS (
  -- CAST: DuckDB sum() widens to HUGEINT (arrow decimal128) which the
  -- gate's value-hash sees as a different type than Spark's BIGINT
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
  FROM base
)
SELECT doc_id, n_tokens, start_off,
       CAST(start_off // {capacity} AS BIGINT) AS bin_start,
       CAST((start_off + greatest(n_tokens - 1, 0)) // {capacity} AS BIGINT) AS bin_end
FROM cum
ORDER BY doc_id
""".strip()


def write_training_shards(bins: DataFrame, path: str, *,
                          bins_per_shard: int = 1024,
                          compression: str = "zstd") -> dict:
    """Materialize packed training shards: fixed-size parquet files of
    consecutive bins plus a ``manifest.json`` (shard → bin range / row
    count / token count) — the training-side contract every data loader
    needs (shard addressing + deterministic order) without inventing a
    bespoke container format; parquet shards stream into any framework's
    loader and survive object storage.

    Sharding is deterministic: shard_id = bin_id // bins_per_shard, so the
    SAME corpus always produces the SAME shard boundaries (resumable,
    diffable). One write-time shuffle on shard_id; files are written via
    partitionBy so each shard is one directory with stable addressing.

    Returns the manifest dict (also written to ``<path>/manifest.json``)."""
    import json
    import os

    from pyspark.sql import functions as F

    out = bins.withColumn(
        "shard_id", (F.col("bin_id") / bins_per_shard).cast("long")
    )
    (
        out.repartition("shard_id")
        .sortWithinPartitions("bin_id")
        .write.mode("overwrite")
        .option("compression", compression)
        .partitionBy("shard_id")
        .parquet(os.path.join(path, "shards"))
    )
    stats = (
        out.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_bins"),
            F.min("bin_id").alias("first_bin"),
            F.max("bin_id").alias("last_bin"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
        )
        .orderBy("shard_id")
        .collect()
    )
    manifest = {
        "bins_per_shard": bins_per_shard,
        "compression": compression,
        "n_shards": len(stats),
        "total_bins": int(sum(r.n_bins for r in stats)),
        "total_tokens": int(sum(r.n_tokens for r in stats)),
        "shards": [
            {
                "shard_id": int(r.shard_id),
                "path": f"shards/shard_id={int(r.shard_id)}",
                "n_bins": int(r.n_bins),
                "first_bin": int(r.first_bin),
                "last_bin": int(r.last_bin),
                "n_tokens": int(r.n_tokens),
            }
            for r in stats
        ],
    }
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def read_training_shards(spark, path: str) -> DataFrame:
    """Load shards back as one DataFrame in global bin_id order.

    Spark gives no row-order guarantee on a bare parquet read, so the
    documented deterministic-loader contract (bins stream in the exact
    order write_training_shards packed them) needs the explicit orderBy —
    one sort of (bin_id) key columns, trivially cheap next to the token
    payload it carries."""
    import os

    return (
        spark.read.parquet(os.path.join(path, "shards"))
        .drop("shard_id")
        .orderBy("bin_id")
    )

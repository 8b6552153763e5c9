"""Incremental index maintenance — U1-U8 (SURVEY.md §2.8).

Reference policy (next-plaid/src/index.rs:1431-1591, update.rs:95-108,
lib.rs:47-62):
  (a) corpus ≤ ``rebuild_threshold`` (999) docs → full rebuild from raw
      embeddings;
  (b) fewer than ``buffer_threshold`` (100) new docs → plain append with the
      existing codec (no centroid expansion);
  (c) otherwise → find outlier tokens (min centroid distance >
      cluster_threshold), train ``max(1, ⌈n/256⌉)·4`` new centroids on them
      (update.rs:621-770), append to the codebook, then append-encode.

Spark translation: indexes are immutable snapshots — every update writes a
NEW index directory (functional, concurrent-reader-safe; the Spark analog of
the reference's atomic temp-file rename + arc-swap hot reload). The raw
``doc_tokens`` DataFrame plays the role of the raw-embedding sidecar (S7):
at cluster scale the source table always exists upstream, so path (a) is
just "rerun the builder".

Delete (U5/U6): stable-id mode — survivors keep their ids and only the
tokens/ivf/doclens tables are filtered; the reference's dense-id
re-sequencing (filtering.rs:52-63) exists for NPY positional alignment,
which Parquet join-by-key makes unnecessary. A dense view is provided for
parity via ``dense_id_mapping``.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from next_plaid_spark.session import local_df
from next_plaid_spark.operators.codec import assign_and_quantize, quantize_residuals
from next_plaid_spark.operators.kmeans import assign_codes, lloyds
from next_plaid_spark.sources.index_store import IndexMeta, PlaidIndex, write_index

REBUILD_THRESHOLD = 999   # lib.rs:47 start_from_scratch
BUFFER_THRESHOLD = 100    # update.rs:95-108

#: target rows per assign+quantize kernel task in the delta path — small
#: enough that a realistic append still parallelizes, large enough that a
#: tiny delta doesn't pay one Python-worker dispatch per source-scan split
_KERNEL_ROWS_PER_TASK = 65_536

#: an old bucket file folds into an append's new file while its rows are
#: at most this multiple of the accumulated smaller mass — the same
#: Bentley-Saxe tiering as the streaming sinks' generational fold
#: (streaming/curation.py), applied per bucket to the token files
DELTA_FOLD_RATIO = 2.0


def _parquet_rows(path: str) -> int:
    """Row count from the parquet footer — a driver-side metadata read
    (no data pages), the tiering key for ``update_index_delta``'s
    per-bucket file folds."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(path).metadata.num_rows


def _parquet_minmax(path: str, col: str) -> tuple[int, int] | None:
    """(min, max) of ``col`` from the parquet footer's row-group
    statistics, or None when any row group lacks them (the caller must
    then treat the file as possibly containing anything)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = md.schema.names.index(col)
    lo = hi = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return None if lo is None else (int(lo), int(hi))
EXPAND_PTS_PER_CENTROID = 256
EXPAND_FACTOR = 4


def find_outliers(new_tokens: DataFrame, centroids: np.ndarray,
                  threshold: float) -> DataFrame:
    """U2: tokens whose min distance to any centroid exceeds the codec's
    cluster_threshold. On unit vectors min_dist² = 2 − 2·max_dot, so the
    existing assignment GEMM yields it for free (update.rs:490-610)."""
    c = np.ascontiguousarray(centroids, dtype=np.float32)
    t2 = float(threshold) ** 2

    def flag(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.asarray([np.asarray(v, dtype=np.float32) for v in pdf["vec"]])
            max_dot = (x @ c.T).max(axis=1)
            x_sq = (x * x).sum(axis=1)
            min_d2 = x_sq + 1.0 - 2.0 * max_dot  # ||x||² + ||c||² − 2x·c
            yield pdf[min_d2 > t2]

    return new_tokens.mapInPandas(flag, schema=new_tokens.schema)


EXPAND_SAMPLE_CAP = 65536  # driver-side bound on collected outlier tokens


def expand_centroids(outliers: DataFrame, centroids: np.ndarray,
                     *, seed: int = 42,
                     sample_cap: int = EXPAND_SAMPLE_CAP) -> np.ndarray:
    """U3: cluster outlier tokens and append the new centroids
    (k = max(1, ⌈n/256⌉)·4, update.rs:621-770).

    The driver collect is bounded by ``sample_cap`` with a seeded sample
    (the codec trainer's HELDOUT_CAP pattern, codec.py:60-75): at 100 TB an
    append of heavily-drifted data can produce millions of outlier tokens,
    and Lloyd's on a representative 64k-sample yields the same coverage
    centroids as the full set. k_new still scales with the TRUE outlier
    count so capacity matches drift volume (capped at sample size)."""
    n_outliers = outliers.count()
    if n_outliers == 0:
        return centroids
    sampled = outliers.select("vec")
    if n_outliers > sample_cap:
        # oversample the target fraction, then trim deterministically
        frac = min(1.0, (sample_cap / n_outliers) * 1.1)
        sampled = sampled.sample(fraction=frac, seed=seed)
    rows = sampled.limit(sample_cap).collect()
    pts = np.asarray([r.vec for r in rows], dtype=np.float32)
    k_new = max(1, int(np.ceil(n_outliers / EXPAND_PTS_PER_CENTROID))) * EXPAND_FACTOR
    k_new = min(k_new, len(pts))
    fresh = lloyds(pts, k_new, seed=seed)
    return np.vstack([centroids, fresh])


def update_index(
    spark: SparkSession,
    index: PlaidIndex,
    new_doc_tokens: DataFrame,
    out_path: str,
    *,
    full_rebuild_tokens: DataFrame | None = None,
    rebuild_threshold: int = REBUILD_THRESHOLD,
    buffer_threshold: int = BUFFER_THRESHOLD,
    seed: int = 42,
) -> PlaidIndex:
    """U1 dispatcher + U4 append re-index → new snapshot at ``out_path``."""
    new_doc_tokens = new_doc_tokens.select(
        F.col("doc_id").cast("long"), F.col("token_idx").cast("int"), "vec"
    )
    # every return path below has materialized its snapshot before
    # returning, so the finally-unpersist (r15, ADVICE) releases the
    # per-call cache on ALL paths — a long-lived driver used to accumulate
    # one cached frame per rebuild/non-bucketed call, at odds with the
    # "per-batch caches must not outlive the batch" discipline
    _cached: DataFrame | None = None
    try:
        n_new_docs = None
        if full_rebuild_tokens is not None:
            # the rebuild-threshold check is the only pre-routing consumer of
            # the new-doc count; when the caller passes no rebuild frame (the
            # streaming-ingest hot path) the count jobs are skipped entirely —
            # update_index_delta derives every count from its own single
            # bucket-histogram aggregation (guide §5: driver round-trips are a
            # per-batch stream cost)
            new_doc_tokens = _cached = new_doc_tokens.cache()
            n_new_docs = new_doc_tokens.select("doc_id").distinct().count()
            # path (a): small corpus → rebuild everything with fresh k-means
            # (sticky layout: a bucketed index rebuilds bucketed)
            if index.meta.num_documents + n_new_docs <= rebuild_threshold:
                from next_plaid_spark.plans.builder import IndexBuilder

                allt = full_rebuild_tokens.unionByName(new_doc_tokens)
                return IndexBuilder(spark, nbits=index.meta.nbits, seed=seed,
                                    bucket_tokens=index.meta.n_buckets).build(
                    allt, out_path
                )

        # bucketed layout: paths (b)/(c) are exactly the fused delta with an
        # empty delete set — route there so the append writes O(batch) new
        # bucket files (tiered-file appends) instead of snapshotting the corpus
        if index.meta.n_buckets:
            # gone=None declares the pure append statically: no delete
            # bookkeeping job, no anti-joins (r14 opt)
            return update_index_delta(spark, index, None, new_doc_tokens,
                                      out_path, seed=seed,
                                      buffer_threshold=buffer_threshold)

        if n_new_docs is None:
            new_doc_tokens = _cached = new_doc_tokens.cache()
            # one fused aggregation for both counts (was two separate jobs)
            _row = new_doc_tokens.agg(
                F.countDistinct("doc_id").alias("d"), F.count("*").alias("n")
            ).collect()[0]
            n_new_docs, n_new_tokens = int(_row.d), int(_row.n)
        else:
            n_new_tokens = new_doc_tokens.count()
        total_docs = index.meta.num_documents + n_new_docs

        centroids = index.centroids_np()
        # path (c): enough new docs → centroid expansion on outliers
        if n_new_docs >= buffer_threshold:
            outliers = find_outliers(
                new_doc_tokens, centroids, index.meta.codec.cluster_threshold
            )
            centroids = expand_centroids(outliers, centroids, seed=seed)

        # append-encode with (possibly expanded) codebook + existing codec
        coded = assign_codes(new_doc_tokens, centroids)
        quantized = quantize_residuals(coded, centroids, index.meta.codec)
        all_tokens = index.tokens.unionByName(quantized)

        meta = IndexMeta(
            k=centroids.shape[0], dim=index.meta.dim, nbits=index.meta.nbits,
            num_documents=total_docs,
            num_embeddings=index.meta.num_embeddings + n_new_tokens,
            avg_doclen=(index.meta.num_embeddings + n_new_tokens) / max(total_docs, 1),
            codec=index.meta.codec,
        )
        # the source's storage layout is sticky: a bucketed index stays
        # bucketed across append snapshots (the layout is the 100 TB search
        # contract, not a per-snapshot accident)
        return write_index(spark, out_path, tokens_coded=all_tokens,
                           centroids=centroids, meta=meta,
                           bucket_tokens=index.meta.n_buckets)
    finally:
        if _cached is not None:
            _cached.unpersist()


def delete_from_index(
    spark: SparkSession,
    index: PlaidIndex,
    doc_ids: list[int] | DataFrame,
    out_path: str,
) -> PlaidIndex:
    """U5: drop documents → new snapshot. Stable ids; IVF/doclens/meta are
    recomputed by write_index from the filtered tokens table."""
    if index.meta.n_buckets:
        # bucketed layout: delete is the fused delta with an empty append
        # set — only the buckets owning a deleted doc are rewritten
        gone = (doc_ids.select(F.col("doc_id").cast("long"))
                if isinstance(doc_ids, DataFrame)
                else local_df(
                    spark, [(int(i),) for i in doc_ids], "doc_id long"))
        empty = spark.createDataFrame(
            [], "doc_id long, token_idx int, vec array<float>")
        return update_index_delta(spark, index, gone, empty, out_path)

    if isinstance(doc_ids, DataFrame):
        gone = doc_ids.select(F.col("doc_id").cast("long"))
        survivors = index.tokens.join(gone, "doc_id", "left_anti")
        n_gone = gone.distinct().count()
    else:
        ids = [int(i) for i in doc_ids]
        survivors = index.tokens.filter(~F.col("doc_id").isin(ids))
        n_gone = index.doclens.filter(F.col("doc_id").isin(ids)).count()

    n_tokens = survivors.count()
    n_docs = index.meta.num_documents - n_gone
    meta = IndexMeta(
        k=index.meta.k, dim=index.meta.dim, nbits=index.meta.nbits,
        num_documents=n_docs, num_embeddings=n_tokens,
        avg_doclen=n_tokens / max(n_docs, 1), codec=index.meta.codec,
    )
    return write_index(spark, out_path, tokens_coded=survivors,
                       centroids=index.centroids_np(), meta=meta,
                       bucket_tokens=index.meta.n_buckets)


def dense_id_mapping(index: PlaidIndex) -> DataFrame:
    """U6 parity view: stable doc_id → dense 0..N−1 ``_subset_`` id
    (row_number over doc_id order — the deterministic equivalent of the
    reference's delete-time re-sequencing)."""
    from pyspark.sql.window import Window

    return index.doclens.select(
        "doc_id",
        (F.row_number().over(Window.orderBy("doc_id")) - 1).alias("dense_id"),
    )


def update_index_delta(
    spark: SparkSession,
    index: PlaidIndex,
    gone_docs: DataFrame | None,
    new_doc_tokens: DataFrame,
    out_path: str,
    *,
    seed: int = 42,
    buffer_threshold: int = BUFFER_THRESHOLD,
) -> PlaidIndex:
    """Fused U5-delete + U1/U4-append for a doc_id-BUCKETED index → new
    snapshot at ``out_path`` that touches only the delta's buckets.

    ``delete_from_index`` + ``update_index`` each rewrite the corpus-sized
    token table (scan + bucket shuffle + write, twice per update). But the
    tokens live in a ``bucketBy(n, doc_id)`` table whose buckets may hold
    MULTIPLE files (r14): an append lands each bucket's new rows as an
    additional bucket file, size-tiering in only the old files small
    relative to the arriving mass (``DELTA_FOLD_RATIO``), and hardlinks
    every other file forward from the previous snapshot (same discipline
    as CodeIndex's units/ layout) — per-append token IO is O(batch) with
    each byte rewritten O(log appends) times, instead of O(corpus) per
    append (the r13 bucket-granular rule degenerated to that: Murmur3
    spreads any realistic batch over every bucket). A delete folds the
    whole bucket owning each gone doc (its rows live in whichever file
    its arrival batch wrote). doc_stats merges old-minus-gone with the delta's groupBy
    (delta-sized shuffle only); IVF re-derives from the merged doc_stats
    (per-doc code sets, ~avg_doclen× smaller than tokens); meta counts are
    arithmetic. Centroid-expansion policy matches ``update_index`` path
    (c) (update.rs:95-108): expansion appends codebook rows, so carried
    buckets' codes stay valid.

    Preconditions (same contract as the two-step form): ``gone_docs`` ⊆
    indexed docs; ``new_doc_tokens`` doc_ids must not collide with kept
    docs (re-encoded docs appear in both gone and new). ``gone_docs=None``
    declares a pure append statically — the delete bookkeeping job and the
    anti-joins are skipped entirely (one fewer doc_stats scan per
    streaming-ingest batch).
    """
    import hashlib
    import re
    import shutil

    from next_plaid_spark.sources.index_store import (
        write_centroids,
        write_ivf_from_doc_stats,
    )

    n = index.meta.n_buckets
    if not n or not index.meta.bucket_table:
        raise ValueError("update_index_delta requires a doc_id-bucketed index; "
                         "use delete_from_index + update_index for plain layouts")

    gone = (None if gone_docs is None
            else gone_docs.select(F.col("doc_id").cast("long")).distinct().cache())
    new_doc_tokens = new_doc_tokens.select(
        F.col("doc_id").cast("long"), F.col("token_idx").cast("int"), "vec"
    ).cache()
    # one aggregation job yields the doc/token counts AND the per-bucket
    # new-row histogram the tiering rule needs below (was three separate
    # actions — this runs once per streaming-ingest batch, so driver
    # round-trips are a per-batch stream cost, guide §5). doc_id determines
    # its bucket, so summing per-bucket distinct doc counts is exact.
    bucket = F.pmod(F.hash(F.col("doc_id")), F.lit(n))
    _hist = (new_doc_tokens.select(bucket.alias("b"), "doc_id")
             .groupBy("b")
             .agg(F.count("*").alias("nt"),
                  F.countDistinct("doc_id").alias("nd"))
             .collect())
    n_new_docs = sum(int(r.nd) for r in _hist)
    n_new_tokens = sum(int(r.nt) for r in _hist)

    centroids = index.centroids_np()
    if n_new_tokens:
        if n_new_docs >= buffer_threshold:
            outliers = find_outliers(
                new_doc_tokens, centroids, index.meta.codec.cluster_threshold
            )
            centroids = expand_centroids(outliers, centroids, seed=seed)
        # Kernel parallelism follows the DELTA size, not the source scan's
        # split count: the cached new-token frame inherits its upstream
        # partitioning (e.g. 32 bucket files for a 2-file code-index
        # delta), so a tiny delta paid 32 Python-worker dispatches per
        # kernel pass. Coalesce to ~rows/_KERNEL_ROWS_PER_TASK tasks
        # (row-wise pure kernel — partition layout can't change values;
        # the bucketed write re-shuffles by bucket anyway, and within-doc
        # row order is preserved by coalesce's in-order concatenation).
        src = new_doc_tokens
        m = max(1, -(-n_new_tokens // _KERNEL_ROWS_PER_TASK))
        if m < src.rdd.getNumPartitions():
            src = src.coalesce(m)
        # one FUSED Arrow pass (B4+B6; values identical to assign_codes →
        # quantize_residuals composed), cached and filled ONCE before the
        # two write legs fork — the unfused, uncached form crossed the
        # Python boundary twice per pass and evaluated the whole pass
        # twice (token write + doc_stats), r14 profile: 2 × 32 tasks of
        # ~0.3-0.9 s pure worker dispatch per 2-file update.
        quantized = assign_and_quantize(src, centroids, index.meta.codec).cache()
        quantized.count()
    else:  # delete-only: no rows to encode
        quantized = index.tokens.filter(F.lit(False))

    # bucket id exactly as Spark's bucketed write assigns it:
    # pmod(Murmur3(doc_id), n) — F.hash IS Murmur3 with the bucketing seed
    # (pinned by test_bucketed_tokens' per-file placement check).
    # new_per_bucket falls out of the single stats aggregation above.
    # The delete-side bookkeeping (dirty buckets + gone doc/token totals)
    # is likewise ONE bucket-grouped aggregation over the gone docs' stats
    # rows (gone ⊆ indexed docs per contract, so the semi-join drops
    # nothing) instead of two separate driver actions — and a delete-free
    # append (every streaming ingest batch) pays for neither beyond this
    # single empty-result job (guide §5: driver round-trips are a
    # per-batch stream cost).
    old_stats = spark.read.parquet(os.path.join(index.path, "doc_stats"))
    _dhist = ([] if gone is None else
              (old_stats.join(gone, "doc_id", "left_semi")
               .select(bucket.alias("b"), "num_tokens")
               .groupBy("b")
               .agg(F.count("*").alias("nd"), F.sum("num_tokens").alias("nt"))
               .collect()))
    del_dirty = {int(r.b) for r in _dhist}
    gone_nd = sum(int(r.nd) for r in _dhist)
    gone_nt = sum(int(r.nt) for r in _dhist)
    new_per_bucket = {int(r.b): int(r.nt) for r in _hist}

    old_dir = os.path.join(index.path, "tokens_bucketed")
    by_bucket: dict[int, list[tuple[str, int]]] = {}
    for fn in os.listdir(old_dir):
        if fn.startswith((".", "_")):  # _SUCCESS + hidden .crc sidecars
            continue
        m = re.search(r"_(\d+)\.c\d+", fn)
        if m:
            p = os.path.join(old_dir, fn)
            by_bucket.setdefault(int(m.group(1)), []).append(
                (p, _parquet_rows(p)))

    # Tiered-file appends (r14): Murmur3 spreads any realistic batch's
    # doc_ids over EVERY bucket, so the r13 rule — rewrite each bucket
    # owning a new doc_id — rewrote the whole corpus per append. A
    # bucket's new rows now land as an ADDITIONAL bucket file, folding
    # in only the old files that are small relative to the arriving mass
    # (Bentley-Saxe tiering, the same size-tiered rule as the streaming
    # sinks' generational fold; tiered on exact footer row counts — file
    # BYTES under-weight small files, whose size is mostly fixed parquet
    # overhead): per-append token IO is O(batch), each row is rewritten
    # O(log appends) times over a snapshot chain, and a settled big file
    # rides forward as a hardlink. Only a bucket that OWNS a deleted doc
    # folds entirely — a gone doc's rows live in whichever file its
    # arrival batch wrote, so file-level pruning of deletes needs the
    # whole bucket read anyway.
    folded: set[str] = set()
    for b, files in by_bucket.items():
        if b in del_dirty:
            folded.update(p for p, _ in files)
            continue
        acc = new_per_bucket.get(b, 0)
        if acc <= 0:
            continue
        for p, rows_in_file in sorted(files, key=lambda t: t[1]):
            if rows_in_file > DELTA_FOLD_RATIO * acc:
                break
            folded.add(p)
            acc += rows_in_file

    cols = index.tokens.columns
    if folded:
        kept_rows = spark.read.parquet(*sorted(folded))
        if gone is not None:
            kept_rows = kept_rows.join(gone, "doc_id", "left_anti")
        kept_rows = kept_rows.select(*cols)
    else:
        kept_rows = index.tokens.filter(F.lit(False)).select(*cols)
    rows = kept_rows.unionByName(quantized.select(*cols))

    bt_new = ("nps_tokens_"
              + hashlib.md5(os.path.abspath(out_path).encode()).hexdigest()[:12])
    new_dir = os.path.join(out_path, "tokens_bucketed")
    touched = del_dirty | set(new_per_bucket)

    def _tokens_leg() -> None:
        # the corpus-facing leg: bucketed delta write + hardlink carry.
        # Independent of the doc_stats/IVF/centroids chain below (disjoint
        # dirs; both evaluate `quantized` from the CACHED new-token frame),
        # so the two legs run concurrently — guide §2.6; each leg's
        # scheduling gaps back-fill with the other's tasks
        spark.sql(f"DROP TABLE IF EXISTS {bt_new}")
        (
            # one partition per touched bucket → one new file per touched
            # bucket, the condition write_index documents for shuffle-free
            # downstream reads
            rows.repartition(max(len(touched), 1), bucket)
            .write.mode("overwrite")
            .option("path", new_dir)
            .bucketBy(n, "doc_id")
            .sortBy("doc_id")
            .saveAsTable(bt_new)
        )
        for files in by_bucket.values():
            for src, _sz in files:
                if src in folded:
                    continue
                dst = os.path.join(new_dir, os.path.basename(src))
                try:
                    os.link(src, dst)
                except OSError:
                    shutil.copy2(src, dst)
        spark.sql(f"REFRESH TABLE {bt_new}")

    new_stats = quantized.groupBy("doc_id").agg(
        F.count("*").alias("num_tokens"),
        F.array_sort(F.collect_set("code")).alias("codes"),
    )

    # doc_stats gets the SAME tiered-file economy as the tokens (r14):
    # the new docs' stats land as a fresh file; an old file folds in only
    # when (a) its footer doc_id range may contain a DELETED doc (row-
    # group min/max pruning — with ordered intake, deletes fold few
    # files) or (b) it is small relative to the arriving row count
    # (Bentley-Saxe); everything else hardlinks forward. All consumers
    # (doclens, doc_codes, the IVF derivation's sort_array fold) are
    # row-order-insensitive, so layout is invisible to values. IVF
    # itself is still rewritten per snapshot — its postings change with
    # every append and a stale tier could resurface deleted docs, so the
    # per-snapshot derive from doc_stats stays the correctness anchor.
    old_sd = os.path.join(index.path, "doc_stats")
    new_sd = os.path.join(out_path, "doc_stats")
    stat_files = []
    for fn in os.listdir(old_sd):
        if fn.startswith((".", "_")):
            continue
        p = os.path.join(old_sd, fn)
        stat_files.append((p, _parquet_rows(p), _parquet_minmax(p, "doc_id")))
    gone_rows = ([] if not gone_nd
                 else [int(r.doc_id) for r in gone.collect()]
                 if gone_nd <= 100_000 else None)

    def _may_contain_gone(mm):
        if not gone_nd:
            return False
        if mm is None or gone_rows is None:  # no stats / huge delete set
            return True
        lo, hi = mm
        return any(lo <= g <= hi for g in gone_rows)

    sd_folded: set[str] = set()
    acc = n_new_docs
    for p, rows_in_file, mm in sorted(stat_files, key=lambda t: t[1]):
        if _may_contain_gone(mm):
            sd_folded.add(p)
        elif acc and rows_in_file <= DELTA_FOLD_RATIO * acc:
            sd_folded.add(p)
            acc += rows_in_file
    if sd_folded:
        fold_stats = spark.read.parquet(*sorted(sd_folded))
        if gone is not None:
            fold_stats = fold_stats.join(gone, "doc_id", "left_anti")
    else:
        fold_stats = old_stats.filter(F.lit(False))

    def _stats_leg() -> None:
        # one file per snapshot hop: the union is delta-sized (new stats +
        # folded small files), and one file IS the LSM tier granularity —
        # without this, each append would emit one tiny file per shuffle
        # partition and the tier structure would be noise-sized
        (fold_stats.unionByName(new_stats).coalesce(1)
         .write.mode("overwrite").parquet(new_sd))
        for p, _rows, _mm in stat_files:
            if p in sd_folded:
                continue
            dst = os.path.join(new_sd, os.path.basename(p))
            try:
                os.link(p, dst)
            except OSError:
                shutil.copy2(p, dst)
        # IVF derives from the doc_stats just written; centroids are a
        # driver-local table — both stay chained behind the stats write
        # inside this leg
        write_ivf_from_doc_stats(spark, out_path, centroids.shape[0])
        write_centroids(spark, out_path, centroids)

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(2) as ex:
        for fut in [ex.submit(_tokens_leg), ex.submit(_stats_leg)]:
            fut.result()

    # per-batch caches must not outlive the batch (a long-lived stream
    # would otherwise accumulate one cached frame set per ingest batch)
    new_doc_tokens.unpersist()
    if gone is not None:
        gone.unpersist()
    if n_new_tokens:
        quantized.unpersist()

    n_docs = index.meta.num_documents - gone_nd + n_new_docs
    n_tok = index.meta.num_embeddings - gone_nt + n_new_tokens
    meta = IndexMeta(
        k=centroids.shape[0], dim=index.meta.dim, nbits=index.meta.nbits,
        num_documents=n_docs, num_embeddings=n_tok,
        avg_doclen=n_tok / max(n_docs, 1), codec=index.meta.codec,
        bucket_table=bt_new, n_buckets=n,
    )
    with open(os.path.join(out_path, "meta.json"), "w") as f:
        f.write(meta.to_json())
    return PlaidIndex(spark, out_path, meta)

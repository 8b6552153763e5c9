"""Corpus-curation operators for large-scale training-data pipelines:
test-set decontamination, Gopher-style repetition statistics, and
deterministic stratified mixture sampling.

Extension surface (not in the reference, BASELINE.json north star) — the
operations a 100 TB pretraining pipeline runs between raw crawl and
tokenizer, built on the same shingle/hash machinery as the dedup suite so
the DuckDB oracle reproduces every value bit-for-bit.

Scale discipline:
- contamination: the eval/benchmark side is tiny relative to a 100 TB
  train corpus, so its distinct shingle set is BROADCAST; the train side
  streams through a broadcast-hash semi/inner join and one groupBy(doc_id)
  — the corpus never shuffles by shingle.
- repetition_stats: two groupBy passes over exploded tokens/bigrams (both
  map-side combinable counts), joined on doc_id.
- stratified_sample: pure stateless filter on a content hash — no shuffle
  at all, partition-parallel at any scale, deterministic under reordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from next_plaid_spark.session import local_df
from next_plaid_spark.functions.text import TOKEN_SPLIT_RE, tokenize_unicode61
from next_plaid_spark.operators.dedup import HASH_HEX_LEN, shingles

# ---------------------------------------------------------------------------
# n-gram LM count table (the classic MapReduce language-model job:
# Brants et al. 2007, "Large Language Models in Machine Translation" —
# count n-grams, prune rare ones; the artifact KN/stupid-backoff
# smoothing consumes)
# ---------------------------------------------------------------------------


def ngram_counts(docs: DataFrame, *, n: int = 2, min_count: int = 2,
                 id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(ngram, cnt): corpus-level n-gram counts with rare-gram pruning.
    One explode → one map-side-combinable groupBy; the count-threshold
    prune happens in the same aggregation pass (HAVING), so the output —
    the only thing that survives to disk — is the pruned table."""
    grams = shingles(docs, n=n, id_col=id_col, text_col=text_col)
    return (
        grams.groupBy(F.col("shingle").alias("ngram"))
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )


def sql_ngram_counts(*, n: int = 2, min_count: int = 2) -> str:
    from next_plaid_spark.operators.dedup import _sql_shingles

    return f"""
WITH sh AS (
{_sql_shingles(n)}
)
SELECT shingle AS ngram, count(*) AS cnt
FROM sh
GROUP BY 1
HAVING count(*) >= {min_count}
""".strip()


# ---------------------------------------------------------------------------
# BPE pair statistics (the inner loop of byte-pair-encoding tokenizer
# training — Sennrich et al. 2016 — as a corpus-scale count job: rank
# adjacent symbol pairs by frequency; the top pair is the next merge)
# ---------------------------------------------------------------------------


def bpe_pair_counts(docs: DataFrame, *, top_n: int = 100,
                    id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(left, right, cnt, rank): the ``top_n`` most frequent adjacent
    character pairs inside word tokens across the corpus — i.e. the merge
    candidates of BPE round 0. Deterministic rank tie-break
    (cnt DESC, left ASC, right ASC).

    Scale shape: explode words → explode character pairs (both narrow) →
    ONE map-side-combinable count aggregation → a top_n rank over the
    symbol-pair table (|Σ|², tiny). Repeated rounds would re-run with the
    learned merge applied by the tokenizer — each round stays one
    aggregation over the corpus."""
    chars = F.array_remove(F.split(F.col("w"), ""), "")
    n = F.size(chars)
    pair_structs = F.zip_with(
        F.slice(chars, 1, n - 1),
        F.slice(chars, 2, n - 1),
        lambda l, r: F.struct(l.alias("lhs"), r.alias("rhs")),
    )
    counted = (
        docs.select(F.explode(tokenize_unicode61(F.col(text_col))).alias("w"))
        .filter(F.length("w") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.count("*").alias("cnt"))
    )
    # global rank over the symbol-pair table: |Σ|² rows — bounded by the
    # alphabet, NOT the corpus, so the single-partition window is safe
    w_rank = Window.orderBy(
        F.col("cnt").desc(), F.col("lhs").asc(), F.col("rhs").asc()
    )
    return (
        counted.withColumn("rank", F.row_number().over(w_rank))
        .filter(F.col("rank") <= top_n)
    )


def sql_bpe_pair_counts(*, top_n: int = 100) -> str:
    from next_plaid_spark.functions.text import TOKEN_SPLIT_RE

    return f"""
WITH words AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '')) AS w
  FROM documents
),
pairs AS (
  SELECT substring(w, i, 1) AS lhs, substring(w, i + 1, 1) AS rhs
  FROM words, unnest(range(1, length(w))) AS r(i)
  WHERE length(w) >= 2
),
counted AS (SELECT lhs, rhs, count(*) AS cnt FROM pairs GROUP BY 1, 2)
SELECT lhs, rhs, cnt,
       CAST(row_number() OVER (ORDER BY cnt DESC, lhs ASC, rhs ASC) AS INT) AS rank
FROM counted
QUALIFY rank <= {top_n}
""".strip()


# ---------------------------------------------------------------------------
# Test-set decontamination (GPT-3 appendix C / FineWeb style n-gram overlap)
# ---------------------------------------------------------------------------


def eval_shingle_set(eval_docs: DataFrame, *, n: int = 3,
                     id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """The distinct shingle universe of an eval/benchmark corpus —
    precompute once (persist it) when screening many batches/streams
    against the same benchmarks."""
    return (
        shingles(eval_docs, n=n, id_col=id_col, text_col=text_col)
        .select("shingle").distinct()
    )


def contamination(train_docs: DataFrame, eval_docs: DataFrame | None = None,
                  *, n: int = 3, threshold: float = 0.0,
                  id_col: str = "doc_id", text_col: str = "text",
                  eval_shingles: DataFrame | None = None) -> DataFrame:
    """Per-train-doc n-gram overlap with an eval/benchmark corpus:
    (doc_id, n_shingles, n_shared, contamination) for training documents
    whose contamination ratio ≥ ``threshold``.

    contamination = |shingles(doc) ∩ shingles(eval corpus)| / |shingles(doc)|
    over DISTINCT word n-grams — the decontamination signal used to drop
    (or flag) training documents that leak benchmark text. Exact int/int
    ratio, bit-identical cross-engine.

    The eval shingle set is collected DISTINCT and broadcast: at 100 TB the
    train side is the whole corpus but benchmarks are a few MB, so the join
    is a broadcast hash join and the only shuffle is the groupBy(doc_id)
    count (map-side combinable). Docs with fewer than ``n`` tokens have no
    shingles and are excluded (they cannot leak an n-gram).

    Pass ``eval_shingles`` (from :func:`eval_shingle_set`, possibly read
    back from storage) to reuse a precomputed benchmark shingle universe
    across many screening runs — streaming curation does exactly that.
    """
    if eval_shingles is None:
        if eval_docs is None:
            raise ValueError("need eval_docs or eval_shingles")
        eval_shingles = eval_shingle_set(
            eval_docs, n=n, id_col=id_col, text_col=text_col)
    # ONE pass over the train shingles: a broadcast LEFT join marks hits
    # (the eval universe is globally distinct, so multiplicity is exactly
    # 1) and a single per-doc aggregate counts both totals and hits.
    # The previous tot/hit groupBy+join diamond evaluated the train
    # shingle subtree (posexplode + lead windows + distinct over the
    # whole corpus) twice.
    tr = shingles(train_docs, n=n, id_col=id_col, text_col=text_col)
    ev = F.broadcast(
        eval_shingles.select("shingle").withColumn("_hit", F.lit(1)))
    out = (
        tr.join(ev, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0)))
            .cast("long").alias("n_shared"),
        )
        .withColumn("contamination", F.col("n_shared") / F.col("n_shingles"))
    )
    return out.filter(F.col("contamination") >= threshold)


def contamination_multi(train_docs: DataFrame, eval_sets: DataFrame,
                        *, n: int = 3, threshold: float = 0.0,
                        id_col: str = "doc_id", text_col: str = "text",
                        eval_name_col: str = "eval_name") -> DataFrame:
    """Screen one training corpus against MANY benchmarks in one pass:
    ``eval_sets`` carries (eval_name, text…) rows; output is
    (doc_id, eval_name, n_shingles, n_shared, contamination) — one row per
    (train doc, leaking benchmark). The labeled distinct shingle union is
    still a single broadcast (benchmarks are small by construction), so
    the corpus-side cost is the same one broadcast join + groupBy as the
    single-benchmark form — screening against B benchmarks costs B× the
    output rows, not B× corpus passes."""
    # shingles() windows per LONG doc id, so every eval document needs its
    # OWN key (keying by benchmark would let lead() windows run across
    # document boundaries). A deterministic content hash serves: identical
    # texts within a benchmark collapse to identical shingle sets — no
    # semantic difference after the distinct.
    ev_docs = eval_sets.withColumn(
        "_eid", F.xxhash64(F.col(eval_name_col), F.col(text_col))
    )
    name_map = ev_docs.select(
        F.col("_eid").alias("doc_id"), F.col(eval_name_col)
    ).distinct()
    ev = F.broadcast(
        shingles(ev_docs, n=n, id_col="_eid", text_col=text_col)
        .join(name_map, "doc_id")
        .select(eval_name_col, "shingle")
        .distinct()
    )
    # per-doc totals ride a doc_id window on the shingle stream (here a
    # LEFT-join single-agg won't do: one shingle can leak from several
    # benchmarks, so the join multiplies rows per matching eval_name and
    # count(*) would overcount totals) — still ONE evaluation of the
    # train shingle subtree instead of the tot/hit diamond's two
    from pyspark.sql.window import Window

    tr = shingles(train_docs, n=n, id_col=id_col, text_col=text_col)
    tr = tr.withColumn(
        "_n_shingles", F.count("*").over(Window.partitionBy("doc_id")))
    out = (
        tr.join(ev, "shingle")
        .groupBy("doc_id", eval_name_col)
        .agg(F.count("*").alias("n_shared"),
             F.first("_n_shingles").alias("n_shingles"))
        .select(
            "doc_id", eval_name_col, "n_shingles",
            F.col("n_shared").cast("long").alias("n_shared"),
            (F.col("n_shared") / F.col("n_shingles")).alias("contamination"),
        )
    )
    return out.filter(F.col("contamination") >= threshold)


def _sql_shingles_by_source(n: int, pred: str) -> str:
    """DuckDB distinct word-n-gram CTE body over documents rows matching
    ``pred`` (mirrors dedup._sql_shingles with a source predicate)."""
    cols = ", ".join(f"toks[i + {j}]" for j in range(n))
    return f"""
  SELECT DISTINCT doc_id, concat_ws(' ', {cols}) AS shingle
  FROM (
    SELECT doc_id, list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS toks
    FROM documents WHERE {pred}
  ), unnest(range(1, greatest(len(toks) - {n}, -1) + 2)) AS r(i)
""".strip()


def sql_contamination_multi(*, eval_sources: tuple, n: int = 3,
                            threshold: float = 0.0) -> str:
    """Oracle for the multi-benchmark entry: each eval source is its own
    named benchmark; train = everything else."""
    src_list = ", ".join(f"'{s}'" for s in eval_sources)
    cols = ", ".join(f"toks[i + {j}]" for j in range(n))
    return f"""
WITH tr AS (
{_sql_shingles_by_source(n, f"source NOT IN ({src_list})")}
),
ev AS (
  SELECT DISTINCT source AS eval_name, concat_ws(' ', {cols}) AS shingle
  FROM (
    SELECT source, list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS toks
    FROM documents WHERE source IN ({src_list})
  ), unnest(range(1, greatest(len(toks) - {n}, -1) + 2)) AS r(i)
),
tot AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY 1),
hit AS (
  SELECT t.doc_id, e.eval_name, count(*) AS n_shared
  FROM tr t JOIN ev e USING (shingle) GROUP BY 1, 2
)
SELECT h.doc_id, h.eval_name, s.n_shingles,
       CAST(h.n_shared AS BIGINT) AS n_shared,
       h.n_shared * 1.0 / s.n_shingles AS contamination
FROM hit h JOIN tot s USING (doc_id)
WHERE h.n_shared * 1.0 / s.n_shingles >= {threshold}
""".strip()


def sql_contamination(*, eval_source: str, n: int = 3,
                      threshold: float = 0.0) -> str:
    """Oracle for the split-by-source entry: eval = documents with
    source = eval_source, train = the rest."""
    return f"""
WITH tr AS (
{_sql_shingles_by_source(n, f"source <> '{eval_source}'")}
),
ev AS (
  SELECT DISTINCT shingle FROM (
{_sql_shingles_by_source(n, f"source = '{eval_source}'")}
  )
),
tot AS (SELECT doc_id, count(*) AS n_shingles FROM tr GROUP BY 1),
hit AS (SELECT doc_id, count(*) AS n_shared FROM tr JOIN ev USING (shingle) GROUP BY 1)
SELECT t.doc_id, t.n_shingles,
       CAST(coalesce(h.n_shared, 0) AS BIGINT) AS n_shared,
       coalesce(h.n_shared, 0) * 1.0 / t.n_shingles AS contamination
FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
WHERE coalesce(h.n_shared, 0) * 1.0 / t.n_shingles >= {threshold}
""".strip()


# Gopher §A1.1 repetition cuts (Rae et al. 2021, Table A1 family):
# published-threshold defaults; the corpus-appropriate values are tunable.
GOPHER_MIN_TOKENS = 10          # (paper: 50 words; synthetic docs are short)
GOPHER_MAX_TOP_WORD_RATIO = 0.20
GOPHER_MIN_DISTINCT_RATIO = 0.20
GOPHER_MAX_DUP_2GRAM = 0.60


def gopher_quality_filter(docs: DataFrame, *,
                          min_tokens: int = GOPHER_MIN_TOKENS,
                          max_top_word_ratio: float = GOPHER_MAX_TOP_WORD_RATIO,
                          min_distinct_ratio: float = GOPHER_MIN_DISTINCT_RATIO,
                          max_dup_2gram: float = GOPHER_MAX_DUP_2GRAM,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, top_word_ratio, distinct_ratio, dup_2gram_ratio,
    keep): the Gopher repetition rules as a keep/drop verdict over
    :func:`repetition_stats` — the form a curation pipeline actually
    consumes (``WHERE keep``). Same exact-integer ratios, so the verdict
    is bit-identical cross-engine."""
    stats = repetition_stats(docs, id_col=id_col, text_col=text_col)
    keep = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("top_word_ratio") <= max_top_word_ratio)
        & (F.col("distinct_ratio") >= min_distinct_ratio)
        & (F.col("dup_2gram_ratio") <= max_dup_2gram)
    )
    return stats.withColumn("keep", keep)


def sql_gopher_quality_filter(*, min_tokens: int = GOPHER_MIN_TOKENS,
                              max_top_word_ratio: float = GOPHER_MAX_TOP_WORD_RATIO,
                              min_distinct_ratio: float = GOPHER_MIN_DISTINCT_RATIO,
                              max_dup_2gram: float = GOPHER_MAX_DUP_2GRAM) -> str:
    return f"""
WITH stats AS (
{sql_repetition_stats()}
)
SELECT *,
       (n_tokens >= {min_tokens}
        AND top_word_ratio <= {max_top_word_ratio}
        AND distinct_ratio >= {min_distinct_ratio}
        AND dup_2gram_ratio <= {max_dup_2gram}) AS keep
FROM stats
""".strip()


# ---------------------------------------------------------------------------
# Gopher-style repetition statistics
# ---------------------------------------------------------------------------


def repetition_stats(docs: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-doc repetition signals (Rae et al. 2021 "Gopher" §A1.1 family):

    (doc_id, n_tokens, top_word_ratio, distinct_ratio, dup_2gram_ratio)

    - top_word_ratio: tf of the most frequent token / n_tokens — high means
      one word dominates (boilerplate, keyword stuffing).
    - distinct_ratio: distinct tokens / n_tokens — low means repetitive.
    - dup_2gram_ratio: 1 − distinct bigrams / total bigrams — the
      duplicate-n-gram fraction; docs with < 2 tokens score 0.

    All counts are exact integers aggregated map-side; the two per-doc
    aggregations (tokens, bigrams) join on doc_id. Docs with zero tokens
    yield no rows (consistent cross-engine). Ratios are exact int/int
    divisions — bit-identical to the oracle.
    """
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.posexplode(tokenize_unicode61(F.col(text_col))).alias("idx", "term"),
    )
    term_counts = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    word_agg = term_counts.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tokens"),
        F.max("tf").alias("top_tf"),
        F.count("*").alias("n_distinct"),
    )
    w = Window.partitionBy("doc_id").orderBy("idx")
    bigrams = (
        toks.select(
            "doc_id",
            F.concat_ws(" ", F.col("term"), F.lead("term", 1).over(w)).alias("gram"),
            F.lead("term", 1).over(w).isNotNull().alias("_ok"),
        )
        .filter(F.col("_ok"))
    )
    bigram_agg = bigrams.groupBy("doc_id").agg(
        F.count("*").alias("n_2grams"),
        F.count_distinct("gram").alias("n_distinct_2grams"),
    )
    return (
        word_agg.join(bigram_agg, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            (F.col("top_tf") / F.col("n_tokens")).alias("top_word_ratio"),
            (F.col("n_distinct") / F.col("n_tokens")).alias("distinct_ratio"),
            F.when(
                F.col("n_2grams").isNotNull(),
                F.lit(1.0) - F.col("n_distinct_2grams") / F.col("n_2grams"),
            ).otherwise(F.lit(0.0)).alias("dup_2gram_ratio"),
        )
    )


def sql_repetition_stats() -> str:
    return f"""
WITH ex AS (
  SELECT doc_id, i AS idx, toks[i] AS term
  FROM (
    SELECT doc_id, list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS toks
    FROM documents
  ), unnest(range(1, len(toks) + 1)) AS r(i)
),
tc AS (SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY 1, 2),
wa AS (
  SELECT doc_id, sum(tf) AS n_tokens, max(tf) AS top_tf, count(*) AS n_distinct
  FROM tc GROUP BY 1
),
bg AS (
  SELECT doc_id, concat_ws(' ', term, lead(term) OVER (PARTITION BY doc_id ORDER BY idx)) AS gram,
         lead(term) OVER (PARTITION BY doc_id ORDER BY idx) IS NOT NULL AS ok
  FROM ex
),
ba AS (
  SELECT doc_id, count(*) AS n_2grams, count(DISTINCT gram) AS n_distinct_2grams
  FROM bg WHERE ok GROUP BY 1
)
SELECT wa.doc_id,
       CAST(wa.n_tokens AS BIGINT) AS n_tokens,
       wa.top_tf * 1.0 / wa.n_tokens AS top_word_ratio,
       wa.n_distinct * 1.0 / wa.n_tokens AS distinct_ratio,
       CASE WHEN ba.n_2grams IS NOT NULL
            THEN 1.0 - ba.n_distinct_2grams * 1.0 / ba.n_2grams
            ELSE 0.0 END AS dup_2gram_ratio
FROM wa LEFT JOIN ba ON wa.doc_id = ba.doc_id
""".strip()


# ---------------------------------------------------------------------------
# Deterministic stratified mixture sampling
# ---------------------------------------------------------------------------

SAMPLE_DENOM = 1_000_000


def stratified_sample(docs: DataFrame, rates: dict[str, float], *,
                      id_col: str = "doc_id", source_col: str = "source",
                      seed: int = 42) -> DataFrame:
    """Downsample each source to its mixture rate with a content-hash coin:

    keep row ⟺ hash60(seed ‖ ':' ‖ source ‖ ':' ‖ doc_id) mod 1e6 < rate·1e6

    The hash (md5-derived, same 60-bit derivation as the dedup suite) makes
    the sample deterministic, reproducible cross-engine, independent of
    partitioning/row order, and STABLE UNDER CORPUS GROWTH: a doc's
    keep/drop decision never changes when other docs arrive, so incremental
    pipeline runs agree with full reruns. Sources absent from ``rates`` are
    dropped (explicit mixture weights only). Pure stateless filter — no
    shuffle, no UDF.
    """
    expr = None
    for src, rate in sorted(rates.items()):
        cut = int(rate * SAMPLE_DENOM)
        h = F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(str(seed)), F.lit(src),
                                  F.col(id_col).cast("string"))),
                1, HASH_HEX_LEN,
            ), 16, 10,
        ).cast("long")
        cond = (F.col(source_col) == src) & (h % SAMPLE_DENOM < cut)
        expr = cond if expr is None else (expr | cond)
    if expr is None:
        return docs.filter(F.lit(False))
    return docs.filter(expr)


def sql_stratified_sample(rates: dict[str, float], *, seed: int = 42,
                          columns: str = "doc_id, source") -> str:
    conds = []
    for src, rate in sorted(rates.items()):
        cut = int(rate * SAMPLE_DENOM)
        h = (f"CAST(concat('0x', substr(md5(concat('{seed}', ':', '{src}', ':', "
             f"CAST(doc_id AS VARCHAR))), 1, {HASH_HEX_LEN})) AS BIGINT)")
        conds.append(f"(source = '{src}' AND {h} % {SAMPLE_DENOM} < {cut})")
    pred = " OR ".join(conds) if conds else "FALSE"
    return f"SELECT {columns} FROM documents WHERE {pred}"


# ---------------------------------------------------------------------------
# DSIR — Data Selection with Importance Resampling (Xie et al. 2023).
# Select raw-corpus docs whose token distribution looks like a small target
# domain: per-doc importance weight = Σ_t [ln p_target(t) − ln p_raw(t)]
# under add-1-smoothed unigram LMs, then Gumbel-top-N resampling (sampling
# ∝ weight without replacement ≡ top-N by logweight + Gumbel noise).
# ---------------------------------------------------------------------------

DSIR_DENOM = 1_000_000


def _unigram_lm(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return (
        docs.select(F.explode(tokenize_unicode61(F.col(text_col))).alias("term"))
        .groupBy("term").agg(F.count("*").alias("cnt"))
    )


def dsir_select(raw: DataFrame, target: DataFrame, *, keep_n: int = 100,
                seed: int = 42, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Returns the ``keep_n`` selected raw docs as (doc_id, log_ratio,
    sample_key): log_ratio = the doc's summed unigram log-likelihood ratio
    (target vs raw, add-1 smoothing over the union vocab), sample_key =
    log_ratio + Gumbel(content-hash uniform) — the Gumbel-top-N trick
    makes one deterministic pass equivalent to weighted sampling without
    replacement (Efraimidis-Spirakis / Vieira).

    Scale shape: the target LM is tiny (a benchmark/domain shard) and is
    BROADCAST; the raw LM is one map-side-combinable explode→agg whose
    result (bounded by language vocabulary) is also broadcast back; the
    per-doc sum is one groupBy(doc_id); the final top-N is sort+limit,
    which Catalyst executes as TakeOrderedAndProject (per-partition heaps,
    no global sort shuffle). The raw corpus is never shuffled by term.

    Determinism: per-doc log folds are value-sorted float64; log_ratio and
    sample_key are rounded to 10 decimals (libm-vs-DuckDB last-ulp, same
    caveat as textstats.unigram_logprob); the Gumbel uniform is the same
    md5-derived 60-bit coin as ``stratified_sample``, so selection is
    reproducible cross-engine and stable under partitioning."""
    t_vocab = _unigram_lm(target, id_col, text_col)
    r_vocab = _unigram_lm(raw, id_col, text_col)
    v_union = (
        t_vocab.select("term").union(r_vocab.select("term")).distinct()
        .agg(F.count("*").alias("v"))
    )
    t_tot = t_vocab.agg(F.sum("cnt").alias("t_tot"))
    r_tot = r_vocab.agg(F.sum("cnt").alias("r_tot"))

    # lr(term) over the RAW vocab (raw tokens absent from target hit the
    # add-1 floor); all four scalars ride along as 1-row broadcasts
    lr = (
        r_vocab.join(t_vocab.withColumnRenamed("cnt", "t_cnt"), "term", "left")
        .crossJoin(F.broadcast(v_union))
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "term",
            (
                F.log((F.coalesce(F.col("t_cnt"), F.lit(0)) + F.lit(1.0))
                      / (F.col("t_tot") + F.col("v")))
                - F.log((F.col("cnt") + F.lit(1.0)) / (F.col("r_tot") + F.col("v")))
            ).alias("lr"),
        )
    )
    toks = raw.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(tokenize_unicode61(F.col(text_col))).alias("term"),
    )
    per_doc = (
        toks.join(F.broadcast(lr), "term")
        .groupBy("doc_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list("lr")), F.lit(0.0), lambda a, x: a + x
            ).alias("lr_sum")
        )
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit(str(seed)), F.lit("dsir"),
                                  F.col("doc_id").cast("string"))),
                1, HASH_HEX_LEN,
            ), 16, 10,
        ).cast("long") % DSIR_DENOM + F.lit(0.5)
    ) / F.lit(float(DSIR_DENOM))
    keyed = per_doc.select(
        "doc_id",
        F.round("lr_sum", 10).alias("log_ratio"),
        F.round(F.col("lr_sum") - F.log(-F.log(u)), 10).alias("sample_key"),
    )
    return keyed.orderBy(F.col("sample_key").desc(), F.col("doc_id")).limit(keep_n)


def sql_dsir_select(*, raw_pred: str, target_pred: str, keep_n: int = 100,
                    seed: int = 42, split_re: str = TOKEN_SPLIT_RE) -> str:
    """DuckDB mirror of ``dsir_select`` over the ``documents`` view."""
    tok = (f"SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), "
           f"'{split_re}'), x -> x <> '')) AS term FROM documents")
    return f"""
WITH r_tok AS ({tok} WHERE {raw_pred}),
t_tok AS ({tok} WHERE {target_pred}),
r_vocab AS (SELECT term, count(*) AS cnt FROM r_tok GROUP BY 1),
t_vocab AS (SELECT term, count(*) AS t_cnt FROM t_tok GROUP BY 1),
v_union AS (
  SELECT count(*) AS v FROM (
    SELECT term FROM r_vocab UNION SELECT term FROM t_vocab
  )
),
tots AS (
  SELECT (SELECT sum(cnt) FROM r_vocab) AS r_tot,
         (SELECT sum(t_cnt) FROM t_vocab) AS t_tot
),
lr AS (
  SELECT r.term,
         ln((coalesce(t.t_cnt, 0) + 1.0) / (tots.t_tot + v_union.v))
         - ln((r.cnt + 1.0) / (tots.r_tot + v_union.v)) AS lr
  FROM r_vocab r LEFT JOIN t_vocab t USING (term)
  CROSS JOIN v_union CROSS JOIN tots
),
per_doc AS (
  SELECT rt.doc_id,
         list_reduce(list_prepend(0.0, list_sort(list(lr.lr))), (a, b) -> a + b) AS lr_sum
  FROM r_tok rt JOIN lr USING (term)
  GROUP BY 1
),
keyed AS (
  SELECT doc_id,
         round(lr_sum, 10) AS log_ratio,
         round(lr_sum - ln(-ln(
           (CAST(concat('0x', substr(md5(concat('{seed}', ':', 'dsir', ':',
              CAST(doc_id AS VARCHAR))), 1, {HASH_HEX_LEN})) AS BIGINT)
            % {DSIR_DENOM} + 0.5) / {float(DSIR_DENOM)})), 10) AS sample_key
  FROM per_doc
)
SELECT doc_id, log_ratio, sample_key
FROM keyed
ORDER BY sample_key DESC, doc_id
LIMIT {keep_n}
""".strip()


# ---------------------------------------------------------------------------
# BPE tokenizer training (Sennrich et al. 2016) — the full iterative merge
# loop extending the round-0 ``bpe_pair_counts``. Training runs driver-side
# over the corpus WORD-FREQUENCY table (bounded: language vocabulary is
# ~10^5-10^6 regardless of corpus bytes — the classic train-on-aggregate
# discipline); application is a broadcast word→pieces join, so the corpus
# itself is never re-scanned per merge.
# ---------------------------------------------------------------------------

BPE_VOCAB_CAP = 65_536


def word_frequencies(docs: DataFrame, *, id_col: str = "doc_id",
                     text_col: str = "text",
                     cap: int = BPE_VOCAB_CAP) -> list[tuple[str, int]]:
    """The (word, count) table BPE trains on, deterministically capped to
    the ``cap`` most frequent words (ties: lexicographic) — one map-side
    combinable agg + a bounded TakeOrdered collect."""
    rows = (
        docs.select(F.explode(tokenize_unicode61(F.col(text_col))).alias("term"))
        .groupBy("term").agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("term").asc())
        .limit(cap)
        .collect()
    )
    return [(r.term, r.cnt) for r in rows]


def train_bpe(docs: DataFrame, *, n_merges: int = 100,
              id_col: str = "doc_id", text_col: str = "text",
              cap: int = BPE_VOCAB_CAP) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges: repeatedly merge the most frequent
    adjacent symbol pair (ties: lexicographically smallest pair), stopping
    early when no pair occurs twice. Pure deterministic driver loop over
    the bounded word-frequency table."""
    vocab = {tuple(w): c for w, c in word_frequencies(
        docs, id_col=id_col, text_col=text_col, cap=cap)}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for word, cnt in vocab.items():
            for a, b in zip(word, word[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _n = best
        merges.append((a, b))
        merged = a + b
        new_vocab: dict[tuple, int] = {}
        for word, cnt in vocab.items():
            out, i = [], 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    return merges


def bpe_segment(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply learned merges to one word: always merge the lowest-rank
    (earliest-learned) pair present — the standard BPE inference order."""
    pieces = list(word)
    while len(pieces) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(pieces, pieces[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        pieces[best_i:best_i + 2] = [pieces[best_i] + pieces[best_i + 1]]
    return pieces


def bpe_word_pieces(docs: DataFrame, merges: list[tuple[str, str]], *,
                    id_col: str = "doc_id", text_col: str = "text",
                    cap: int = BPE_VOCAB_CAP) -> list[tuple[str, int]]:
    """(word, n_pieces) for every distinct corpus word — the broadcastable
    segmentation table ``bpe_token_counts`` joins."""
    ranks = {p: i for i, p in enumerate(merges)}
    return [
        (w, len(bpe_segment(w, ranks)))
        for w, _ in word_frequencies(docs, id_col=id_col, text_col=text_col, cap=cap)
    ]


def bpe_token_counts(docs: DataFrame, merges: list[tuple[str, str]], *,
                     id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc BPE token count under the trained merges: explode words,
    broadcast-join the (word → n_pieces) segmentation table, one sum.
    Words beyond the training cap fall back to character count (their
    untrained segmentation). The corpus shuffles once, by doc_id."""
    spark = docs.sparkSession
    pieces = local_df(
        spark,
        bpe_word_pieces(docs, merges, id_col=id_col, text_col=text_col),
        "term string, n_pieces int",
    )
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(tokenize_unicode61(F.col(text_col))).alias("term"),
    )
    return (
        toks.join(F.broadcast(pieces), "term", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_pieces"), F.length("term")).alias("n_pieces"),
        )
        .groupBy("doc_id")
        .agg(F.sum("n_pieces").cast("long").alias("n_bpe_tokens"),
             F.count("*").alias("n_words"))
    )


# ---------------------------------------------------------------------------
# Temperature-based mixture resampling (multilingual-LM recipe: XLM / mC4).
# Rates are COMPUTED from corpus shares, not given: q_s ∝ (n_s)^α flattens
# the source distribution (α<1 upsamples the tail relatively), then the
# budget is pinned so the most-upsampled source keeps ALL its docs
# (rate ≤ 1 everywhere — no replication, a pure filter).
# ---------------------------------------------------------------------------

RATE_DECIMALS = 9  # rates rounded before the integer cut so the coin is
#                    bitwise engine-portable (pow() may differ in the last
#                    ulp between JVM and C libm)


def temperature_resample(docs: DataFrame, *, alpha: float = 0.3,
                         id_col: str = "doc_id", source_col: str = "source",
                         seed: int = 42) -> DataFrame:
    """Keep each source at rate ∝ (n_s)^(α−1), normalized so max rate = 1.

    Derivation: target share q_s = n_s^α / Σ n_j^α; feasible budget
    T = min_s n_s/q_s (the binding source keeps everything); rate_s =
    q_s·T/n_s. The keep decision reuses ``stratified_sample``'s content-
    hash coin — deterministic, partitioning-independent, stable under
    corpus growth of OTHER sources (a doc's coin never changes; only the
    rates move with the mixture).

    Plan shape: one tiny per-source agg (map-side combinable), two scalar
    reductions over |sources| rows, a broadcast join of the rate table,
    then a stateless filter — the corpus is scanned once and never
    shuffled. Output: the surviving docs plus their source's ``rate``.
    """
    counts = docs.groupBy(F.col(source_col).alias("_src")).agg(
        F.count("*").cast("double").alias("_n"))
    # q_s and the binding budget as scalar subqueries (|sources| rows)
    tot = counts.agg(F.sum(F.pow("_n", F.lit(alpha))).alias("_z"))
    rates = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn("_q", F.pow("_n", F.lit(alpha)) / F.col("_z"))
        # SIZE-BOUND CONTRACT (r15, VERDICT r14 watch item): this
        # unpartitioned window ranges over the per-SOURCE count table —
        # |sources| rows, never the corpus. Keep it that way.
        .withColumn("_budget", F.min(F.col("_n") / F.col("_q"))
                    .over(Window.partitionBy()))
        .select(
            "_src",
            F.round(F.col("_q") * F.col("_budget") / F.col("_n"),
                    RATE_DECIMALS).alias("rate"),
        )
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("_src"),
                              F.col(id_col).cast("string"))),
            1, 15,
        ), 16, 10,
    ).cast("long")
    return (
        docs.join(F.broadcast(rates), docs[source_col] == F.col("_src"))
        .filter(h % SAMPLE_DENOM
                < F.floor(F.col("rate") * SAMPLE_DENOM).cast("long"))
        .drop("_src")
    )


def sql_temperature_resample(*, alpha: float = 0.3, seed: int = 42,
                             columns: str = "doc_id, source, rate") -> str:
    return f"""
WITH counts AS (
  SELECT source AS _src, CAST(count(*) AS DOUBLE) AS _n
  FROM documents GROUP BY source
),
rates AS (
  SELECT _src,
         round(pow(_n, {alpha}) / (SELECT sum(pow(_n, {alpha})) FROM counts)
               * (SELECT min(_n / (pow(_n, {alpha})
                    / (SELECT sum(pow(_n, {alpha})) FROM counts))) FROM counts)
               / _n, {RATE_DECIMALS}) AS rate
  FROM counts
)
SELECT {columns}
FROM documents d JOIN rates r ON d.source = r._src
WHERE CAST(concat('0x', substr(md5(concat('{seed}', ':', d.source, ':',
        CAST(d.doc_id AS VARCHAR))), 1, 15)) AS BIGINT) % {SAMPLE_DENOM}
      < CAST(floor(r.rate * {SAMPLE_DENOM}) AS BIGINT)
""".strip()


# ---------------------------------------------------------------------------
# Document chunking: overlapping token windows (the RAG / long-context
# pretraining split — the complement of pack_sequences, which concatenates).
# ---------------------------------------------------------------------------

def chunk_documents(docs: DataFrame, *, chunk_tokens: int = 64,
                    stride: int = 32, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(doc_id, chunk_id, chunk_text, n_tokens): sliding token windows —
    chunk i covers tokens [i·stride, i·stride + chunk_tokens).

    Chunk count = 1 + ⌈max(n − chunk_tokens, 0)/stride⌉ (the final window
    reaches the document tail and may be short; empty docs emit nothing) —
    the HuggingFace ``return_overflowing_tokens``/stride convention.
    Pure column expressions (sequence + explode + slice): partition-
    parallel, no shuffle, no UDF; output rows ∝ input tokens / stride.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = tokenize_unicode61(F.col(text_col))
    n = F.size(toks)
    n_chunks = (F.lit(1) + F.ceil(
        F.greatest(n - chunk_tokens, F.lit(0)) / F.lit(stride))).cast("int")
    return (
        docs.select(F.col(id_col).cast("long").alias("doc_id"),
                    toks.alias("_toks"), n.alias("_n"), n_chunks.alias("_nc"))
        .filter(F.col("_n") > 0)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_id"),
            "_toks",
        )
        .select(
            "doc_id", "chunk_id",
            F.array_join(
                F.slice(F.col("_toks"),
                        F.col("chunk_id") * stride + 1, chunk_tokens),
                " ").alias("chunk_text"),
            F.size(F.slice(F.col("_toks"),
                           F.col("chunk_id") * stride + 1, chunk_tokens))
            .cast("long").alias("n_tokens"),
        )
    )


def sql_chunk_documents(*, chunk_tokens: int = 64, stride: int = 32) -> str:
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'),
                     x -> x <> '') AS toks
  FROM documents
),
sized AS (
  SELECT doc_id, toks, len(toks) AS n,
         1 + CAST(ceil(greatest(len(toks) - {chunk_tokens}, 0)
                       / {stride}.0) AS INT) AS nc
  FROM t WHERE len(toks) > 0
)
SELECT doc_id, CAST(r.i AS INT) AS chunk_id,
       array_to_string(list_slice(toks, r.i * {stride} + 1,
                                  r.i * {stride} + {chunk_tokens}), ' ')
         AS chunk_text,
       CAST(len(list_slice(toks, r.i * {stride} + 1,
                           r.i * {stride} + {chunk_tokens})) AS BIGINT)
         AS n_tokens
FROM sized, unnest(range(0, nc)) AS r(i)
""".strip()


def sample_n_per_group(docs: DataFrame, group_cols, n: int, *,
                       id_col: str = "doc_id", seed: int = 42) -> DataFrame:
    """Exactly-n deterministic sample per group (the fixed-BUDGET half of
    mixture construction; ``stratified_sample`` is the fixed-RATE half):
    rows ranked inside each group by a content hash (seed ‖ ':' ‖ id) and
    the top n kept — reproducible cross-engine, independent of row order,
    and stable per row under corpus growth except at the rank-n boundary
    (a budget cap is inherently competitive, unlike a rate coin).

    Scale shape: delegates to ``topk_agg.grouped_topk`` — map-side bounded
    heaps prune each partition to ≤ n rows per group before the single
    group-keyed shuffle; groups smaller than n pass through whole.
    """
    from next_plaid_spark.operators.topk_agg import grouped_topk

    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)),
                              F.col(id_col).cast("string"))),
            1, HASH_HEX_LEN,
        ), 16, 10,
    ).cast("long")
    return grouped_topk(
        docs.withColumn("_h", h), list(group_cols), "_h", n,
        descending=True, tie_cols=[id_col], rank_col=None,
    ).drop("_h")


def sql_sample_n_per_group(*, n: int, group_cols: str = "source",
                           seed: int = 42) -> str:
    """DuckDB mirror over ``documents``: identical hash rank per group."""
    return f"""
SELECT doc_id, {group_cols} FROM (
  SELECT doc_id, {group_cols},
         row_number() OVER (
           PARTITION BY {group_cols}
           ORDER BY CAST(concat('0x', substr(md5(concat('{seed}', ':', CAST(doc_id AS VARCHAR))), 1, {HASH_HEX_LEN})) AS BIGINT) DESC,
                    doc_id ASC
         ) AS rn
  FROM documents
) WHERE rn <= {n}
""".strip()


def span_corrupt(docs: DataFrame, *, mask_rate: float = 0.15,
                 span_len: int = 3, seed: int = 42,
                 id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """T5-style span corruption (Raffel et al. '20 §3.1.4) as a
    deterministic corpus transform → (doc_id, inputs, targets, n_masked):

        inputs  = text with each masked span replaced by <extra_id_i>
        targets = <extra_id_0> span₀ <extra_id_1> span₁ … <extra_id_n>

    Span selection is a content-hash coin over ``span_len``-token blocks
    (hash60(seed ‖ doc ‖ block) < rate — the stratified_sample discipline:
    deterministic, order-independent, cross-engine identical); adjacent
    masked blocks merge into one span, exactly like T5's span merging.
    Pure column expressions + one per-doc ordered fold — no shuffle beyond
    the per-doc agg, no Python in the path."""
    from pyspark.sql.window import Window

    cut = int(mask_rate * SAMPLE_DENOM)
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.posexplode(tokenize_unicode61(F.col(text_col))).alias("pos", "tok"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)),
                              F.col("doc_id").cast("string"),
                              (F.col("pos") - F.col("pos") % span_len)
                              .cast("string"))),
            1, HASH_HEX_LEN,
        ), 16, 10,
    ).cast("long")
    t = toks.withColumn("masked", (h % SAMPLE_DENOM) < cut)
    w = Window.partitionBy("doc_id").orderBy("pos")
    t = t.withColumn(
        "run_start",
        F.col("masked")
        & ~F.coalesce(F.lag("masked", 1).over(w), F.lit(False)),
    ).withColumn(
        # sentinel index = how many runs started at or before this token
        "sid",
        F.sum(F.col("run_start").cast("int")).over(w) - 1,
    )
    sentinel = F.concat(
        F.lit("<extra_id_"), F.col("sid").cast("string"), F.lit(">")
    )
    t = t.select(
        "doc_id", "pos", "masked", "run_start",
        F.when(~F.col("masked"), F.col("tok"))
        .when(F.col("run_start"), sentinel).alias("in_piece"),
        F.when(
            F.col("masked"),
            F.when(F.col("run_start"),
                   F.concat(sentinel, F.lit(" "), F.col("tok")))
            .otherwise(F.col("tok")),
        ).alias("tgt_piece"),
    )

    def fold(piece_col):
        # null pieces survive into the struct list but array_join drops
        # them, so only emitted pieces appear — in pos order
        return F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", piece_col))),
                lambda x: x[piece_col],
            ),
            " ",
        )

    per_doc = t.groupBy("doc_id").agg(
        fold("in_piece").alias("inputs"),
        fold("tgt_piece").alias("_tgt"),
        F.sum(F.col("masked").cast("long")).alias("n_masked"),
        F.sum(F.col("run_start").cast("long")).alias("n_runs"),
    )
    ids = docs.select(F.col(id_col).cast("long").alias("doc_id"))
    return ids.join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("inputs", F.lit("")).alias("inputs"),
        F.when(
            F.coalesce("n_runs", F.lit(0)) > 0,
            F.concat(F.col("_tgt"), F.lit(" <extra_id_"),
                     F.col("n_runs").cast("string"), F.lit(">")),
        ).otherwise(F.lit("")).alias("targets"),
        F.coalesce("n_masked", F.lit(0)).alias("n_masked"),
    )


def sql_span_corrupt(*, mask_rate: float = 0.15, span_len: int = 3,
                     seed: int = 42) -> str:
    cut = int(mask_rate * SAMPLE_DENOM)
    return f"""
WITH toks AS (
  SELECT doc_id, i - 1 AS pos, t[i] AS tok
  FROM (
    SELECT doc_id, list_filter(string_split_regex(lower(text), '{TOKEN_SPLIT_RE}'), x -> x <> '') AS t
    FROM documents
  ), unnest(range(1, len(t) + 1)) AS r(i)
),
marked AS (
  SELECT doc_id, pos, tok,
         (CAST(concat('0x', substr(md5(concat('{seed}', ':', CAST(doc_id AS VARCHAR), ':', CAST(pos - pos % {span_len} AS VARCHAR))), 1, {HASH_HEX_LEN})) AS BIGINT) % {SAMPLE_DENOM}) < {cut} AS masked
  FROM toks
),
starts AS (
  SELECT *,
         masked AND NOT coalesce(lag(masked) OVER (PARTITION BY doc_id ORDER BY pos), FALSE) AS run_start
  FROM marked
),
runs AS (
  SELECT *,
         sum(CASE WHEN run_start THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS sid
  FROM starts
),
pieces AS (
  SELECT doc_id, pos, masked, run_start,
         CASE WHEN NOT masked THEN tok
              WHEN run_start THEN concat('<extra_id_', sid, '>') END AS in_piece,
         CASE WHEN masked AND run_start THEN concat('<extra_id_', sid, '> ', tok)
              WHEN masked THEN tok END AS tgt_piece
  FROM runs
),
per_doc AS (
  SELECT doc_id,
         string_agg(in_piece, ' ' ORDER BY pos) AS inputs,
         string_agg(tgt_piece, ' ' ORDER BY pos) AS tgt,
         sum(CASE WHEN masked THEN 1 ELSE 0 END) AS n_masked,
         sum(CASE WHEN run_start THEN 1 ELSE 0 END) AS n_runs
  FROM pieces GROUP BY 1
)
SELECT d.doc_id,
       coalesce(p.inputs, '') AS inputs,
       CASE WHEN coalesce(p.n_runs, 0) > 0
            THEN concat(p.tgt, ' <extra_id_', p.n_runs, '>')
            ELSE '' END AS targets,
       -- CAST: DuckDB sum() widens to HUGEINT (arrow decimal128), which
       -- the gate's value-hash sees as a different type than BIGINT
       CAST(coalesce(p.n_masked, 0) AS BIGINT) AS n_masked
FROM documents d LEFT JOIN per_doc p USING (doc_id)
ORDER BY d.doc_id
""".strip()

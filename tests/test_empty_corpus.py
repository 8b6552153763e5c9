"""Empty-corpus robustness: pipeline bootstrap (0-row tables) is a real
production state — a new deployment's first run, a fully-filtered shard, a
dry-run config. Every relational / LLM-pipeline entry must plan and execute
against 0-row tables and return a typed (usually empty) result instead of
crashing on a driver-side collect. The PLAID/BM25/code-search entries are
excluded by contract: building an index over an empty corpus raises a
documented error (k-means cannot train on nothing), as does
``train_ivf_cells`` when called directly."""

from __future__ import annotations

import pytest

from tests.conftest import spark  # noqa: F401

SRC = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

# empty-in -> empty-out is the contract for all of these
EMPTY_IN_EMPTY_OUT = [
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_incremental", "dedup_bloom", "simhash_fingerprints",
    "dedup_simhash", "dedup_winnowing", "winnowing_fingerprints",
    "duplicate_spans", "scrub_spans", "dedup_clusters", "leakage_split",
    "decontaminate", "decontaminate_multi", "corpus_profile",
    "repetition_stats", "gopher_filter", "stratified_sample",
    "sample_per_source", "temperature_resample", "dsir_select",
    "ngram_lm_counts", "bpe_pair_counts", "bpe_tokenize",
    "perplexity_proxy", "perplexity_bigram", "quality_score", "language_id",
    "token_count", "doc_fingerprint", "text_normalize", "pii_scrub",
    "url_filter", "chunk_documents", "pack_sequences", "packed_bins",
    "span_corrupt", "events_sessions", "events_hourly", "events_retention",
    "events_rolling", "events_sliding", "events_asof", "events_props",
    "events_session_windows", "monthly_shipments", "pricing_summary",
    "revenue_by_nation", "top_orders_per_customer", "distinct_langs",
    "source_overlap", "cosine_topk", "dedup_embedding", "semdedup",
    "mmr_topk", "hard_negatives", "ann_lsh_topk", "ann_ivf_topk",
]


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """0-row copies of every testdata table, real schemas preserved."""
    import duckdb

    d = tmp_path_factory.mktemp("sf_empty")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet') LIMIT 0)"
            f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


def test_entries_survive_empty_corpus(spark, empty_sf_dir):
    from next_plaid_spark import queries as q

    reg = q.queries()
    failures, nonempty = [], []
    for name in EMPTY_IN_EMPTY_OUT:
        try:
            # collect(), not count(): count() prunes projections and would
            # mask per-column failures (ANSI divide-by-zero in a derived
            # column crashed events_funnel this way)
            if len(reg[name](spark, empty_sf_dir).collect()) > 0:
                nonempty.append(name)
        except Exception as e:  # collect every failure, report once
            failures.append((name, type(e).__name__, str(e).split("\n")[0]))
    assert not failures, f"crashed on empty corpus: {failures}"
    assert not nonempty, f"non-empty result from empty corpus: {nonempty}"


@pytest.fixture(scope="module")
def singleton_sf_dir(tmp_path_factory):
    """1-row copies of every table: singleton quantiles, stddev-of-one,
    self-only windows — the other classic boundary."""
    import duckdb

    d = tmp_path_factory.mktemp("sf_one")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet') LIMIT 1)"
            f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


def test_entries_survive_singleton_corpus(spark, singleton_sf_dir):
    from next_plaid_spark import queries as q

    reg = q.queries()
    failures = []
    for name in EMPTY_IN_EMPTY_OUT:
        try:
            reg[name](spark, singleton_sf_dir).collect()
        except Exception as e:
            failures.append((name, type(e).__name__, str(e).split("\n")[0]))
    assert not failures, f"crashed on singleton corpus: {failures}"


@pytest.fixture(scope="module")
def nulltext_sf_dir(tmp_path_factory):
    """Two real documents plus a NULL-text row and an empty-string row —
    ingested corpora carry both, and no entry may crash on them."""
    import duckdb

    d = tmp_path_factory.mktemp("sf_null")
    con = duckdb.connect()
    for t in TABLES:
        if t == "documents":
            continue
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet') LIMIT 2)"
            f" TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.execute(
        f"""COPY (
  SELECT * FROM (SELECT * FROM read_parquet('{SRC}/documents.parquet') LIMIT 2)
  UNION ALL SELECT 9001, NULL, 'xx', 'null_source', NULL
  UNION ALL SELECT 9002, '', 'xx', 'empty_source', 0
) TO '{d}/documents.parquet' (FORMAT PARQUET)"""
    )
    return str(d)


def test_entries_survive_null_and_empty_text(spark, nulltext_sf_dir):
    from next_plaid_spark import queries as q

    reg = q.queries()
    failures = []
    for name in EMPTY_IN_EMPTY_OUT:
        try:
            reg[name](spark, nulltext_sf_dir).collect()
        except Exception as e:
            failures.append((name, type(e).__name__, str(e).split("\n")[0]))
    assert not failures, f"crashed on NULL/empty text: {failures}"


def test_events_funnel_empty_keeps_step_scaffold(spark, empty_sf_dir):
    """The funnel's step list is static config, so the scaffold survives
    an empty events table — with every count at zero."""
    from next_plaid_spark import queries as q

    rows = q.queries()["events_funnel"](spark, empty_sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        d = r.asDict()
        num_cols = [v for k, v in d.items() if isinstance(v, (int, float))]
        assert num_cols and all(v == 0 for v in num_cols), d


def test_train_ivf_cells_empty_raises_clearly(spark, empty_sf_dir):
    from next_plaid_spark.operators.similarity import train_ivf_cells

    emb = spark.read.parquet(f"{empty_sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError, match="empty corpus"):
        train_ivf_cells(emb, 4)

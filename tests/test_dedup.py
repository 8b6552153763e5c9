"""Dedup suite invariants: methods agree on planted near-duplicates."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from next_plaid_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash_fingerprints,
    simhash_near_pairs,
)


@pytest.fixture(scope="module")
def docs(spark, documents):
    return documents.cache()


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([(0, "one two"), (1, "a b c d")], "doc_id long, text string")
    got = shingles(df, n=3).collect()
    # 2 tokens → no 3-gram shingles; 4 tokens → 2 shingles
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, set()).add(r.shingle)
    assert 0 not in by_doc
    assert by_doc[1] == {"a b c", "b c d"}


def test_exact_duplicates_have_jaccard_one(spark):
    df = spark.createDataFrame(
        [(0, "the quick brown fox jumps"), (1, "the quick brown fox jumps"),
         (2, "something else entirely here now")],
        "doc_id long, text string",
    )
    pairs = ngram_jaccard_pairs(df, threshold=0.99).collect()
    assert len(pairs) == 1
    assert (pairs[0].doc_a, pairs[0].doc_b) == (0, 1)
    assert pairs[0].jaccard == 1.0


def test_minhash_finds_planted_dups(spark, docs):
    exact = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.9).collect()
    }
    assert exact, "corpus should contain planted near-dups"
    mh = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(docs, threshold=0.9).collect()
    }
    # LSH with 4 bands × 4 rows at j≥0.9: collision prob ≈ 1-(1-0.9^4)^4 ≈ 0.99
    recall = len(exact & mh) / len(exact)
    assert recall >= 0.8, f"minhash recall {recall:.2f} over {len(exact)} pairs"


def test_simhash_flags_planted_dups(spark, docs):
    exact = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.95).collect()
    }
    sim = {
        (r.doc_a, r.doc_b)
        for r in simhash_near_pairs(docs, max_hamming=3).collect()
    }
    if exact:
        recall = len(exact & sim) / len(exact)
        assert recall >= 0.5, f"simhash recall {recall:.2f}"
    # fingerprints are total and unique per doc
    fps = simhash_fingerprints(docs).collect()
    assert len(fps) == docs.filter(F.size(F.split(F.lower("text"), "[^a-z0-9]+")) > 0).count()


def test_embedding_near_dup_lsh_matches_exact(spark, embeddings):
    """The shipped LSH-candidate path must reproduce the exact all-pairs
    result on the synthetic corpus (candidates ⊇ every qualifying pair)."""
    from next_plaid_spark.operators.dedup import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_exact,
    )

    lsh = {
        (r.id_a, r.id_b): r.cos_sim
        for r in embedding_near_dup_pairs(embeddings, threshold=0.45, dim=64).collect()
    }
    exact = {
        (r.id_a, r.id_b): r.cos_sim
        for r in embedding_near_dup_pairs_exact(embeddings, threshold=0.45).collect()
    }
    assert set(lsh) == set(exact)
    for k in exact:
        assert abs(lsh[k] - exact[k]) < 1e-12


def test_embedding_near_dup_no_cartesian(spark, embeddings):
    from next_plaid_spark.operators.dedup import embedding_near_dup_pairs

    df = embedding_near_dup_pairs(embeddings, threshold=0.45, dim=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_shingle_df_cap_bounds_fanout(spark):
    """Skewed fixture: one stop-shingle shared by every doc would fan the
    join out N²; the cap removes it while planted dup pairs survive."""
    from next_plaid_spark.operators.dedup import (
        cap_shingle_df,
        ngram_jaccard_pairs,
        shingles,
    )

    stop = "in the of"  # every doc contains this 3-gram
    docs = [(i, f"in the of unique{i} filler{i} words{i} here{i}") for i in range(40)]
    # plant one true near-dup pair (docs 100/101 share almost all shingles)
    docs += [(100, "in the of alpha beta gamma delta epsilon"),
             (101, "in the of alpha beta gamma delta epsilon zeta")]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    sh = shingles(df, n=3)
    capped = cap_shingle_df(sh, max_df=10)
    # the stop-shingle (df=42) is gone; discriminative shingles survive
    remaining = {r.shingle for r in capped.select("shingle").distinct().collect()}
    assert stop not in remaining
    assert "alpha beta gamma" in remaining

    pairs = ngram_jaccard_pairs(df, threshold=0.5, max_shingle_df=10).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    assert (100, 101) in got
    # without the planted pair, no unrelated docs pair up through the
    # stop-shingle (uncapped they ALL share it and meet in the join)
    assert all(p == (100, 101) for p in got)


def test_shingle_df_cap_off_matches_oracle_mode(spark, docs):
    """max_shingle_df=None (oracle mode) is byte-identical to the original."""
    from next_plaid_spark.operators.dedup import ngram_jaccard_pairs

    a = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()
    )
    b = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(docs, threshold=0.8, max_shingle_df=None).collect()
    )
    assert a == b


# -- MOSS winnowing ------------------------------------------------------------


def test_winnowing_guarantee_shared_run_shares_fingerprint(spark):
    from next_plaid_spark.operators.dedup import winnowing_fingerprints

    # docs share a run of exactly k+w-1 = 7 tokens ("c1..c7") in different
    # positions — the winnowing guarantee promises ≥1 common fingerprint
    shared = "c1 c2 c3 c4 c5 c6 c7"
    docs = spark.createDataFrame(
        [(0, f"a1 a2 a3 {shared} a4 a5"), (1, f"{shared} b1 b2 b3 b4 b5 b6")],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(docs, k=4, w=4)
    a = {r.fp for r in fps.filter("doc_id = 0").collect()}
    b = {r.fp for r in fps.filter("doc_id = 1").collect()}
    assert a & b, "shared k+w-1 token run must share a fingerprint"


def test_winnowing_short_doc_and_density(spark):
    from next_plaid_spark.operators.dedup import winnowing_fingerprints

    docs = spark.createDataFrame(
        [(0, "t1 t2 t3"),                      # < k tokens → no grams
         (1, " ".join(f"w{i}" for i in range(20)))],
        "doc_id long, text string",
    )
    fps = winnowing_fingerprints(docs, k=4, w=4)
    assert fps.filter("doc_id = 0").count() == 0
    n = fps.filter("doc_id = 1").count()
    # 17 grams, 14 full windows, ≤1 selection per window, ≥⌈14/w⌉ distinct
    assert 4 <= n <= 14


# ---------------------------------------------------------------------------
# SemDeDup (cluster-bounded semantic dedup)
# ---------------------------------------------------------------------------

def _no_surviving_dup_pair(emb, removed_ids, assigned_cells, threshold):
    """Survivors of the same cell must have no pair ≥ threshold."""
    from next_plaid_spark.functions.vector import cosine

    surv = emb.join(assigned_cells, "vec_id").filter(
        ~F.col("vec_id").isin(*removed_ids) if removed_ids else F.lit(True)
    )
    a = surv.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"),
                    "cell")
    b = surv.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"),
                    "cell")
    return (
        a.join(b, "cell").filter(F.col("ia") < F.col("ib"))
        .filter(cosine(F.col("va"), F.col("vb")) >= threshold)
        .count()
    )


@pytest.mark.parametrize("cells", ["voronoi", "kmeans"])
def test_semdedup_no_surviving_within_cell_pair(spark, embeddings, cells):
    from next_plaid_spark.operators.dedup import (
        _semdedup_removals_from_cells, semdedup_removals)

    thr = 0.35
    removed = semdedup_removals(
        embeddings, n_cells=16, threshold=thr, cells=cells).collect()
    assert len(removed) > 0  # synthetic corpus has semantic near-dups at 0.35
    removed_ids = [r.vec_id for r in removed]
    # reconstruct the SAME cell assignment the operator used
    from next_plaid_spark.functions.vector import cosine as _cos  # noqa: F401
    if cells == "voronoi":
        seeds = (embeddings
                 .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
                 .limit(16)
                 .select(F.col("vec_id").alias("seed_id"),
                         F.col("embedding").alias("sv")))
        from next_plaid_spark.functions.vector import cosine
        assigned = (
            embeddings.select("vec_id", F.col("embedding").alias("_vec"))
            .crossJoin(F.broadcast(seeds))
            .withColumn("csim", cosine(F.col("_vec"), F.col("sv")))
            .groupBy("vec_id")
            .agg(F.max(F.struct(F.col("csim"), (-F.col("seed_id")).alias("ns"))).alias("m"))
            .select("vec_id", (-F.col("m.ns")).alias("cell"))
        )
    else:
        from next_plaid_spark.operators.similarity import (
            ivf_cell_assignments, train_ivf_cells)
        cmat = train_ivf_cells(embeddings, 16)
        assigned = ivf_cell_assignments(embeddings, cmat).select(
            F.col("_id").alias("vec_id"), F.col("_cell").cast("long").alias("cell"))
    assert _no_surviving_dup_pair(embeddings, removed_ids, assigned, thr) == 0


def test_semdedup_removal_is_minimal_per_pair(spark):
    """Hand-built corpus: 2 near-identical vectors in one cell → exactly the
    one closer to the center is removed; an isolated vector survives."""
    from next_plaid_spark.operators.dedup import semdedup_removals

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),      # isolated
        (3, [0.0, 0.0, 1.0, 0.0]),      # isolated
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    removed = semdedup_removals(emb, n_cells=2, threshold=0.99).collect()
    assert len(removed) == 1
    assert removed[0].vec_id in (0, 1)
    # only ONE of the dup pair is gone, both isolated vectors survive
    assert {0, 1} - {removed[0].vec_id}


def test_semdedup_bad_cells_raises(spark, embeddings):
    from next_plaid_spark.operators.dedup import semdedup_removals

    with pytest.raises(ValueError):
        semdedup_removals(embeddings, cells="hdbscan").collect()


# ---------------------------------------------------------------------------
# duplicate_spans (exact substring-dedup signal)
# ---------------------------------------------------------------------------

def test_duplicate_spans_exact_run_length(spark):
    """Span length is exact: 12 shared tokens at different offsets in each
    doc, with differing prefixes/suffixes; an unrelated doc stays absent."""
    from next_plaid_spark.operators.dedup import duplicate_spans

    shared = " ".join(f"s{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(0, f"{shared} x1 x2 x3"),
         (1, f"y1 y2 {shared}"),
         (2, "q0 q1 q2 q3 q4 q5 q6 q7 q8 q9")],
        "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.span_len
           for r in duplicate_spans(docs, k=4, min_len=8).collect()}
    assert got == {(0, 1): 12}


def test_duplicate_spans_interrupted_run_not_merged(spark):
    """A single interrupting token splits the run: two 6-token halves never report as
    a 13-token span (diagonal islands are genuinely consecutive)."""
    from next_plaid_spark.operators.dedup import duplicate_spans

    left = " ".join(f"a{i}" for i in range(6))
    right = " ".join(f"b{i}" for i in range(6))
    docs = spark.createDataFrame(
        [(0, f"{left} MID {right}"),
         (1, f"{left} OTHER {right}")],
        "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.span_len
           for r in duplicate_spans(docs, k=3, min_len=6).collect()}
    assert got == {(0, 1): 6}  # max island = one half, never 13


def test_duplicate_spans_stop_gram_cap(spark):
    """A gram shared by every doc (boilerplate) is dropped by max_gram_df,
    so it alone creates no pairs; a rare long run still reports."""
    from next_plaid_spark.operators.dedup import duplicate_spans

    boiler = "the quick brown fox jumps over"
    rows = [(i, f"{boiler} unique{i} u{i}a u{i}b u{i}c") for i in range(10)]
    rows.append((100, "z0 z1 z2 z3 z4 z5 z6 z7 z8 z9"))
    rows.append((101, "z0 z1 z2 z3 z4 z5 z6 z7 z8 z9"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.span_len
           for r in duplicate_spans(docs, k=4, min_len=6,
                                    max_gram_df=3).collect()}
    assert got == {(100, 101): 10}


def test_duplicate_spans_matches_python_lcs(spark):
    """Independent-algorithm oracle: the relational diagonal-island result
    equals a classic DP longest-common-token-substring over every pair, on
    randomized corpora engineered to contain shared runs."""
    from next_plaid_spark.operators.dedup import duplicate_spans
    import random

    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(12)]  # small alphabet → frequent overlap
    docs = []
    for d in range(14):
        n = rng.randint(5, 28)
        docs.append((d, " ".join(rng.choice(vocab) for _ in range(n))))

    k, min_len = 3, 4

    def lcs_tokens(a: list, b: list) -> int:
        best = 0
        prev = [0] * (len(b) + 1)
        for i in range(1, len(a) + 1):
            cur = [0] * (len(b) + 1)
            for j in range(1, len(b) + 1):
                if a[i - 1] == b[j - 1]:
                    cur[j] = prev[j - 1] + 1
                    best = max(best, cur[j])
            prev = cur
        return best

    toks = {d: t.split() for d, t in docs}
    expected = {}
    for i in range(len(docs)):
        for j in range(i + 1, len(docs)):
            l = lcs_tokens(toks[i], toks[j])
            if l >= min_len:
                expected[(i, j)] = l

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r.doc_a, r.doc_b): r.span_len
           for r in duplicate_spans(df, k=k, min_len=min_len,
                                    max_gram_df=10**6).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# cross-corpus incremental dedup (dedup_against)
# ---------------------------------------------------------------------------

def test_dedup_against_basic_and_no_new_new_pairs(spark):
    from next_plaid_spark.operators.dedup import dedup_against

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    old = spark.createDataFrame(
        [(1, base), (2, "totally different words nothing shared here at all")],
        "doc_id long, text string",
    )
    # 100 and 101 duplicate EACH OTHER and doc 1; 102 is unique
    new = spark.createDataFrame(
        [(100, base), (101, base),
         (102, "unique content with no old counterpart whatsoever ok")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.dup_of, r.jaccard)
           for r in dedup_against(new, old, threshold=0.5).collect()}
    # both exact copies map to old doc 1 with jaccard 1.0; the unique new
    # doc is absent; the new-new duplicate pair (100, 101) is NOT reported
    assert got == {100: (1, 1.0), 101: (1, 1.0)}


def test_dedup_against_best_match_tiebreak(spark):
    from next_plaid_spark.operators.dedup import dedup_against

    base = "one two three four five six seven eight nine ten"
    # two old docs with identical text → identical jaccard; the lower
    # old doc_id must win
    old = spark.createDataFrame(
        [(5, base), (3, base)], "doc_id long, text string"
    )
    new = spark.createDataFrame([(100, base)], "doc_id long, text string")
    (row,) = dedup_against(new, old, threshold=0.5).collect()
    assert (row.doc_id, row.dup_of, row.jaccard) == (100, 3, 1.0)


def test_minhash_band_ledger_shape(spark):
    from next_plaid_spark.operators.dedup import minhash_band_ledger

    docs = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i} common tail words here") for i in range(6)],
        "doc_id long, text string",
    )
    rows = minhash_band_ledger(docs).collect()
    # n_bands rows per doc, bands 0..3
    assert len(rows) == 6 * 4
    assert {r.band for r in rows} == {0, 1, 2, 3}


# ---------------------------------------------------------------------------
# exact-substring dedup materialization (scrub_duplicate_spans)
# ---------------------------------------------------------------------------

def test_scrub_spans_cross_doc_keep_first(spark):
    from next_plaid_spark.operators.dedup import scrub_duplicate_spans

    run = "a b c d e f g h"  # exactly k=8 tokens
    docs = spark.createDataFrame(
        [(0, run + " x y z"),       # global first occurrence — untouched
         (1, "p q " + run + " r"),  # later occurrence — the run dropped
         (2, "m n o p q r s")],     # < k tokens — no grams, untouched
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in scrub_duplicate_spans(docs, k=8).collect()}
    assert out[0].clean_text == "a b c d e f g h x y z"
    assert out[0].n_dropped == 0
    assert out[1].clean_text == "p q r"
    assert out[1].n_dropped == 8
    assert out[2].clean_text == "m n o p q r s"
    assert out[2].n_dropped == 0


def test_scrub_spans_within_doc_repeat(spark):
    from next_plaid_spark.operators.dedup import scrub_duplicate_spans

    run = "t1 t2 t3 t4 t5 t6 t7 t8"
    docs = spark.createDataFrame(
        [(0, run + " u v " + run)], "doc_id long, text string"
    )
    (row,) = scrub_duplicate_spans(docs, k=8).collect()
    # the doc's OWN first occurrence survives; the repeat is scrubbed
    assert row.clean_text == run + " u v"
    assert row.n_dropped == 8
    assert row.n_tokens == 10


def test_scrub_spans_long_run_fully_covered(spark):
    from next_plaid_spark.operators.dedup import scrub_duplicate_spans

    run = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12"  # L=12 > k
    docs = spark.createDataFrame(
        [(0, run), (1, "lead " + run + " tail")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in scrub_duplicate_spans(docs, k=8).collect()}
    # every one of the L−k+1 duplicated grams is non-first in doc 1, so
    # the whole 12-token run goes, not just one k-window
    assert out[1].clean_text == "lead tail"
    assert out[1].n_dropped == 12
    assert out[0].n_dropped == 0


def test_scrub_spans_empty_and_no_dups(spark):
    from next_plaid_spark.operators.dedup import scrub_duplicate_spans

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert scrub_duplicate_spans(empty, k=8).count() == 0

    uniq = spark.createDataFrame(
        [(0, "w1 w2 w3 w4 w5 w6 w7 w8 w9"), (1, "x1 x2 x3 x4 x5 x6 x7 x8")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in scrub_duplicate_spans(uniq, k=8).collect()}
    assert all(out[i].n_dropped == 0 for i in (0, 1))


def test_scrub_spans_stop_gram_cap(spark):
    """max_gram_df exempts boilerplate grams (df above the cap) from
    scrubbing entirely — every copy keeps them — while rare duplicated
    grams still scrub to their (doc_id, pos)-first occurrence. Pins the
    in-stream window df (doc-boundary flags summed over the gh frame)
    against hand-computed expectations."""
    from next_plaid_spark.operators.dedup import scrub_duplicate_spans

    rows = [(i, f"a b c u{i}x u{i}y") for i in range(6)]  # "a b c" df=6
    rows += [(10, "x y z w"), (11, "x y z w")]            # rare dup, df=2
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r
           for r in scrub_duplicate_spans(docs, k=3, max_gram_df=3).collect()}
    # boilerplate "a b c" survives in EVERY doc (exempt, not deduped)
    for i in range(6):
        assert out[i].clean_text == f"a b c u{i}x u{i}y"
        assert out[i].n_dropped == 0
    # the rare duplicate still scrubs: doc 10 is first, doc 11 loses all
    # tokens covered by its (non-first) k-gram occurrences
    assert out[10].n_dropped == 0
    assert out[11].clean_text == ""
    assert out[11].n_dropped == 4


def test_dedup_against_empty_old_corpus(spark):
    from next_plaid_spark.operators.dedup import dedup_against

    new = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    old = spark.createDataFrame([], "doc_id long, text string")
    assert dedup_against(new, old, threshold=0.5).count() == 0


def test_bloom_dedup_exact_copy_hits_everything(spark):
    from next_plaid_spark.operators.dedup import bloom_dedup_against

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    old = spark.createDataFrame(
        [(1, base), (2, "totally different words nothing shared here at all")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(100, base),
         (101, "unique fresh content with no old counterpart whatsoever ok")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bloom_dedup_against(new, old, n=3).collect()}
    # the exact copy: every shingle is a true member — no false negatives,
    # ever (Bloom's one-sided guarantee)
    assert got[100].hit_ratio == 1.0 and got[100].maybe_dup
    assert got[100].bloom_hits == got[100].n_shingles == 8  # 10 tokens, n=3
    # the fresh doc: at 2^20 bits / a handful of set bits, FP ≈ 0
    assert got[101].bloom_hits == 0 and not got[101].maybe_dup


def test_bloom_dedup_partial_overlap_ratio(spark):
    from next_plaid_spark.operators.dedup import bloom_dedup_against

    # new doc = 5 old tokens ++ 5 fresh tokens: of its 8 trigram shingles
    # the first 3 are old members, the 3 boundary-spanning ones and the 2
    # fresh-only ones are not → hit_ratio = 3/8
    old = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon nu xi omicron pi rho")],
        "doc_id long, text string",
    )
    (row,) = bloom_dedup_against(new, old, n=3, threshold=0.5).collect()
    assert (row.n_shingles, row.bloom_hits) == (8, 3)
    assert row.hit_ratio == 3 / 8 and not row.maybe_dup


def test_bloom_bits_bounded_and_deterministic(spark):
    from next_plaid_spark.operators.dedup import BLOOM_HASHES, bloom_bits

    docs = spark.createDataFrame(
        [(i, f"w{i} x{i} y{i} z{i} common tail words here") for i in range(6)],
        "doc_id long, text string",
    )
    bits = bloom_bits(docs, n=3).collect()
    positions = sorted(r.pos for r in bits)
    # distinct positions, every one inside [0, m); ≤ k per distinct shingle
    assert len(positions) == len(set(positions))
    assert all(0 <= p < (1 << 20) for p in positions)
    n_shingles = shingles(docs, n=3).select("shingle").distinct().count()
    assert len(positions) <= BLOOM_HASHES * n_shingles
    # same corpus → bit-identical filter (md5, no RNG)
    again = sorted(r.pos for r in bloom_bits(docs, n=3).collect())
    assert again == positions


def test_bloom_dedup_empty_old_corpus_all_miss(spark):
    from next_plaid_spark.operators.dedup import bloom_dedup_against

    new = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    old = spark.createDataFrame([], "doc_id long, text string")
    (row,) = bloom_dedup_against(new, old, n=3).collect()
    assert row.bloom_hits == 0 and not row.maybe_dup


def _rows_by_pos(df):
    return {r.pos: r.cnt for r in df.collect()}


def test_bloom_counts_delta_equals_rebuild(spark):
    from next_plaid_spark.operators.dedup import bloom_counts, bloom_counts_delta

    corpus = [(i, f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta")
              for i in range(8)]
    add = [(100, "brand new words arriving with this batch today ok"),
           (101, "alpha3 beta3 gamma3 delta3 epsilon3 zeta")]  # re-insert twin
    remove = [corpus[2], corpus[5]]
    base = spark.createDataFrame(corpus, "doc_id long, text string")
    counts = bloom_counts(base, n=3)
    merged = bloom_counts_delta(
        counts,
        spark.createDataFrame(add, "doc_id long, text string"),
        spark.createDataFrame(remove, "doc_id long, text string"),
        n=3,
    )
    target = [d for d in corpus if d not in remove] + add
    rebuilt = bloom_counts(
        spark.createDataFrame(target, "doc_id long, text string"), n=3)
    assert _rows_by_pos(merged) == _rows_by_pos(rebuilt)


def test_bloom_counts_retraction_unblocks_probe(spark):
    from next_plaid_spark.operators.dedup import (
        bloom_counts, bloom_counts_delta, bloom_probe)

    doomed = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    keeper = "one two three four five six seven eight nine ten"
    corpus = spark.createDataFrame(
        [(1, doomed), (2, keeper)], "doc_id long, text string")
    probe = spark.createDataFrame([(100, doomed)], "doc_id long, text string")
    counts = bloom_counts(corpus, n=3)

    (before,) = bloom_probe(probe, counts.filter("cnt > 0").select("pos"),
                            n=3).collect()
    assert before.hit_ratio == 1.0  # blocked while doc 1 is in the corpus

    after_counts = bloom_counts_delta(
        counts, None,
        spark.createDataFrame([(1, doomed)], "doc_id long, text string"), n=3)
    (after,) = bloom_probe(probe, after_counts.select("pos"), n=3).collect()
    # retraction fully unblocks: every doomed shingle's bits decremented to 0
    assert after.bloom_hits == 0
    # the keeper's bits survive the retraction
    (keep,) = bloom_probe(
        spark.createDataFrame([(200, keeper)], "doc_id long, text string"),
        after_counts.select("pos"), n=3).collect()
    assert keep.hit_ratio == 1.0

"""Corpus-curation operators: decontamination, repetition stats,
stratified mixture sampling (operators/corpus.py)."""

import pytest
from pyspark.sql import functions as F

from next_plaid_spark.operators.corpus import (
    SAMPLE_DENOM,
    contamination,
    repetition_stats,
    stratified_sample,
)
from tests.conftest import spark  # noqa: F401


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_contamination_exact_overlap(spark):
    # eval doc: "a b c d" → 3-gram shingles {a b c, b c d}
    ev = _docs(spark, [(100, "a b c d", "eval")])
    tr = _docs(
        spark,
        [
            (1, "a b c d", "train"),          # both shingles shared → 1.0
            (2, "a b c x y z", "train"),      # {a b c, b c x, c x y, x y z} → 1/4
            (3, "p q r s", "train"),          # no overlap → 0.0
            (4, "a b", "train"),              # < 3 tokens → no shingles → no row
        ],
    )
    got = {
        r.doc_id: (r.n_shingles, r.n_shared, r.contamination)
        for r in contamination(tr, ev, n=3).collect()
    }
    assert got == {1: (2, 2, 1.0), 2: (4, 1, 0.25), 3: (2, 0, 0.0)}


def test_contamination_threshold_filters(spark):
    ev = _docs(spark, [(100, "a b c d", "eval")])
    tr = _docs(spark, [(1, "a b c d", "t"), (2, "p q r s", "t")])
    kept = contamination(tr, ev, n=3, threshold=0.5).collect()
    assert [r.doc_id for r in kept] == [1]


def test_contamination_eval_side_is_broadcast(spark):
    ev = _docs(spark, [(100, "a b c d", "eval")])
    tr = _docs(spark, [(1, "a b c d", "t")])
    plan = contamination(tr, ev, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_repetition_stats_crafted(spark):
    # "x x x x" → 4 tokens, top_tf 4, 1 distinct; bigrams: 3 total, 1 distinct
    # "a b a b" → top_tf 2, 2 distinct; bigrams {a b, b a, a b}: 3 tot 2 dist
    # "a b c"   → all distinct; bigrams {a b, b c}: 2 tot 2 dist → dup 0.0
    docs = _docs(
        spark,
        [(1, "x x x x", "s"), (2, "a b a b", "s"), (3, "a b c", "s")],
    )
    got = {
        r.doc_id: (
            r.n_tokens,
            round(r.top_word_ratio, 6),
            round(r.distinct_ratio, 6),
            round(r.dup_2gram_ratio, 6),
        )
        for r in repetition_stats(docs).collect()
    }
    assert got == {
        1: (4, 1.0, 0.25, round(1 - 1 / 3, 6)),
        2: (4, 0.5, 0.5, round(1 - 2 / 3, 6)),
        3: (3, round(1 / 3, 6), 1.0, 0.0),
    }


def test_repetition_stats_empty_doc_dropped(spark):
    docs = _docs(spark, [(1, "...", "s"), (2, "ok ok", "s")])
    assert [r.doc_id for r in repetition_stats(docs).collect()] == [2]


def test_stratified_sample_deterministic_and_stable(spark):
    rows = [(i, f"doc {i}", f"src{i % 3}") for i in range(300)]
    docs = _docs(spark, rows)
    rates = {"src0": 0.5, "src1": 0.1}
    kept1 = sorted(r.doc_id for r in stratified_sample(docs, rates).collect())
    kept2 = sorted(r.doc_id for r in stratified_sample(docs, rates).collect())
    assert kept1 == kept2
    # stability under corpus growth: a doc's decision never flips when the
    # corpus doubles (incremental runs agree with full reruns)
    bigger = _docs(spark, rows + [(i + 1000, f"doc {i}", "src0") for i in range(300)])
    kept_big = set(r.doc_id for r in stratified_sample(bigger, rates).collect())
    assert set(kept1) == {d for d in kept_big if d < 1000}


def test_stratified_sample_rates_and_unlisted_dropped(spark):
    n = 3000
    docs = _docs(spark, [(i, "t", "a" if i % 2 else "b") for i in range(n)])
    out = stratified_sample(docs, {"a": 0.3}).groupBy("source").count().collect()
    got = {r.source: r["count"] for r in out}
    assert "b" not in got  # unlisted source dropped entirely
    assert got["a"] == pytest.approx(0.3 * n / 2, rel=0.15)  # hash-coin rate


def test_stratified_sample_rate_one_keeps_all(spark):
    docs = _docs(spark, [(i, "t", "a") for i in range(50)])
    assert stratified_sample(docs, {"a": 1.0}).count() == 50


def test_stratified_sample_no_shuffle(spark):
    docs = _docs(spark, [(i, "t", "a") for i in range(10)])
    plan = (
        stratified_sample(docs, {"a": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


# -- DSIR selection ------------------------------------------------------------


def test_dsir_prefers_target_like_docs(spark):
    from next_plaid_spark.operators.corpus import dsir_select

    # target talks about "alpha beta"; raw has 5 target-like docs and 20
    # off-domain docs — with keep_n=5, Gumbel noise (±~2-3 nats at 1e-6
    # resolution) cannot overcome the large logratio gap
    target = _docs(spark, [(900 + i, "alpha beta alpha beta gamma", "t") for i in range(4)])
    raw = _docs(
        spark,
        [(i, "alpha beta gamma alpha beta alpha beta alpha beta", "r") for i in range(5)]
        + [(100 + i, "delta epsilon zeta eta theta iota kappa wow", "r") for i in range(20)],
    )
    got = dsir_select(raw, target, keep_n=5).collect()
    assert sorted(r.doc_id for r in got) == [0, 1, 2, 3, 4]
    # selected rows expose both the raw weight and the perturbed key
    for r in got:
        assert r.sample_key != r.log_ratio


def test_dsir_deterministic_under_repartition(spark):
    from next_plaid_spark.operators.corpus import dsir_select

    target = _docs(spark, [(900, "a b c", "t")])
    raw = _docs(spark, [(i, f"a b c word{i} word{i*7%13}", "r") for i in range(40)])
    a = sorted(map(tuple, dsir_select(raw, target, keep_n=10).collect()))
    b = sorted(map(tuple, dsir_select(raw.repartition(7), target, keep_n=10).collect()))
    assert a == b


def test_dsir_topn_is_take_ordered_not_global_sort(spark):
    from next_plaid_spark.operators.corpus import dsir_select

    target = _docs(spark, [(900, "a b", "t")])
    raw = _docs(spark, [(i, "a b c", "r") for i in range(10)])
    plan = (
        dsir_select(raw, target, keep_n=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


# -- BPE tokenizer training ------------------------------------------------------


def test_bpe_train_hand_computed(spark):
    from next_plaid_spark.operators.corpus import bpe_segment, train_bpe

    # corpus: "low" x5, "lower" x2, "newest" x6, "widest" x3 (classic
    # Sennrich example, no end-of-word marker)
    rows = (
        [(i, "low", "s") for i in range(5)]
        + [(10 + i, "lower", "s") for i in range(2)]
        + [(20 + i, "newest", "s") for i in range(6)]
        + [(30 + i, "widest", "s") for i in range(3)]
    )
    merges = train_bpe(_docs(spark, rows), n_merges=4)
    # pair counts round 1: es=9, st=9, lo=7, we=8(newest 6 + lower 2)…
    # tie es/st at 9 → lexicographic: ('e','s') first, then ('es','t')=9
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    ranks = {p: i for i, p in enumerate(merges)}
    seg = bpe_segment("newest", ranks)
    assert "".join(seg) == "newest" and "est" in seg


def test_bpe_train_matches_independent_reference(spark):
    from next_plaid_spark.operators.corpus import train_bpe, word_frequencies

    rows = [(i, f"abra cadabra alakazam banana bandana w{i % 5}", "s")
            for i in range(30)]
    docs = _docs(spark, rows)

    # independent plain-dict reference over the same word-frequency table
    def ref_bpe(wordfreq, n):
        vocab = {tuple(w): c for w, c in wordfreq}
        out = []
        for _ in range(n):
            pc = {}
            for w, c in vocab.items():
                for p in zip(w, w[1:]):
                    pc[p] = pc.get(p, 0) + c
            if not pc:
                break
            (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            if cnt < 2:
                break
            out.append((a, b))
            nv = {}
            for w, c in vocab.items():
                o, i = [], 0
                while i < len(w):
                    if i + 1 < len(w) and (w[i], w[i + 1]) == (a, b):
                        o.append(a + b); i += 2
                    else:
                        o.append(w[i]); i += 1
                nv[tuple(o)] = nv.get(tuple(o), 0) + c
            vocab = nv
        return out

    wf = word_frequencies(docs)
    assert train_bpe(docs, n_merges=12) == ref_bpe(wf, 12)


def test_bpe_token_counts_fallback_and_sum(spark):
    from next_plaid_spark.operators.corpus import bpe_token_counts, train_bpe

    docs = _docs(spark, [(0, "aaaa aaaa bb", "s"), (1, "aaaa", "s")])
    merges = train_bpe(docs, n_merges=10)
    got = {r.doc_id: (r.n_bpe_tokens, r.n_words)
           for r in bpe_token_counts(docs, merges).collect()}
    # "aaaa" fully merges to 1 piece; "bb" stays 2 chars (its pair occurs
    # only once in the vocab — below the ≥2 merge threshold)
    assert got == {0: (4, 3), 1: (1, 1)}


# -- PII scrubbing ---------------------------------------------------------------


def test_pii_scrub_redacts_and_counts(spark):
    from next_plaid_spark.operators.textstats import pii_scrub

    docs = spark.createDataFrame(
        [
            (0, "mail me at alice.smith+x@corp.example.org thanks", "s"),
            (1, "server 192.168.1.254 and backup 10.0.0.1", "s"),
            (2, "call +1(415)555-0199 now", "s"),
            (3, "nothing sensitive here", "s"),
            (4, "a@b.io or 8.8.8.8 or +44-20-7946-0958", "s"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r.doc_id: (r.text_clean, r.n_redactions)
           for r in pii_scrub(docs).collect()}
    assert got[0] == ("mail me at [EMAIL] thanks", 1)
    assert got[1] == ("server [IP] and backup [IP]", 2)
    assert got[2] == ("call [PHONE] now", 1)
    assert got[3] == ("nothing sensitive here", 0)
    assert got[4][1] == 3 and "[EMAIL]" in got[4][0] and "[IP]" in got[4][0] \
        and "[PHONE]" in got[4][0]


def test_temperature_resample_flattens_skew(spark):
    """1000-doc A / 40-doc B skew: α=0.3 keeps all of B (binding source)
    and downsamples A toward the flattened mixture; α=1 is a no-op."""
    from next_plaid_spark.operators.corpus import temperature_resample

    rows = [(i, "A" if i < 1000 else "B") for i in range(1040)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")

    out = temperature_resample(docs, alpha=0.3).collect()
    by_src = {}
    for r in out:
        by_src[r.source] = by_src.get(r.source, 0) + 1
    # q_A/q_B = (1000/40)^0.3 ≈ 2.63; budget binds at A or B s.t. max rate=1
    # rate_B = 1 (minority fully kept), rate_A = (40/1000)·(1000/40)^0.3 ≈ .105
    assert by_src["B"] == 40
    expected_a = 0.105 * 1000
    assert abs(by_src["A"] - expected_a) < 40  # hash-coin tolerance
    # the mixture moved toward flat: before 25:1, after ~2.6:1
    assert by_src["A"] / by_src["B"] < 5

    rates = {r.source: r.rate for r in out}
    assert rates["B"] == 1.0

    noop = temperature_resample(docs, alpha=1.0).collect()
    assert len(noop) == 1040  # α=1 → rates all 1, pure pass-through


def test_temperature_resample_stable_under_growth(spark):
    """A doc's keep/drop decision depends only on its own (source, id) coin;
    growing ANOTHER source changes rates but reuses the same coins — the
    kept set of the binding source is unchanged."""
    from next_plaid_spark.operators.corpus import temperature_resample

    base = [(i, "A" if i < 400 else "B") for i in range(440)]
    grown = base + [(1000 + i, "C") for i in range(100)]
    d1 = spark.createDataFrame(base, "doc_id long, source string")
    d2 = spark.createDataFrame(grown, "doc_id long, source string")
    kept1 = {r.doc_id for r in temperature_resample(d1, alpha=0.3).collect()
             if r.source == "B"}
    kept2 = {r.doc_id for r in temperature_resample(d2, alpha=0.3).collect()
             if r.source == "B"}
    # B stays the binding (rate-1) source in both mixtures → identical set
    assert kept1 == kept2 == {r[0] for r in base if r[1] == "B"}


def test_sample_n_per_group_exact_budget_and_determinism(spark):
    from next_plaid_spark.operators.corpus import sample_n_per_group

    docs = spark.createDataFrame(
        [(i, f"src{i % 4}") for i in range(40)] + [(100, "tiny")],
        "doc_id long, source string",
    )
    got = sample_n_per_group(docs, ["source"], 3).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    # exactly n per full group; small groups pass through whole
    assert all(len(v) == 3 for s, v in by_src.items() if s != "tiny")
    assert by_src["tiny"] == {100}
    # deterministic: identical on re-run and under different partitioning
    again = sample_n_per_group(docs.repartition(7), ["source"], 3).collect()
    assert sorted((r.source, r.doc_id) for r in again) == sorted(
        (r.source, r.doc_id) for r in got)

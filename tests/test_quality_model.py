"""CCNet/GPT-3 quality-classifier filtering: separation, determinism,
and the Pareto acceptance shape."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from next_plaid_spark.operators.quality_model import (
    pareto_quality_filter,
    score_quality,
    train_quality_classifier,
)

GOOD_VOCAB = ("the quick brown fox jumps over a lazy dog while reading "
              "classic literature about science history and philosophy").split()
BAD_VOCAB = ("click here buy now free casino winner jackpot xxx spam "
             "viagra lottery prize claim urgent").split()


@pytest.fixture(scope="module")
def corpora(spark):
    rng = random.Random(7)

    def mk(vocab, n, start):
        return [(start + i, " ".join(rng.choice(vocab) for _ in range(30)))
                for i in range(n)]

    good = spark.createDataFrame(mk(GOOD_VOCAB, 120, 0),
                                 "doc_id long, text string")
    bad = spark.createDataFrame(mk(BAD_VOCAB, 120, 1000),
                                "doc_id long, text string")
    return good, bad


@pytest.fixture(scope="module")
def model(corpora):
    good, bad = corpora
    return train_quality_classifier(good, bad, n_features=1 << 12,
                                    max_iter=20)


def test_classifier_separates_held_out(spark, corpora, model):
    rng = random.Random(99)

    def mk(vocab, n, start):
        return [(start + i, " ".join(rng.choice(vocab) for _ in range(25)))
                for i in range(n)]

    held = spark.createDataFrame(
        mk(GOOD_VOCAB, 40, 5000) + mk(BAD_VOCAB, 40, 6000),
        "doc_id long, text string",
    )
    scored = {r.doc_id: r.quality_prob for r in
              score_quality(model, held).collect()}
    good_mean = sum(v for k, v in scored.items() if k < 6000) / 40
    bad_mean = sum(v for k, v in scored.items() if k >= 6000) / 40
    assert good_mean > 0.9 and bad_mean < 0.1


def test_pareto_filter_keeps_quality_and_a_tail(spark, corpora, model):
    good, bad = corpora
    mixed = good.unionByName(bad)
    kept = pareto_quality_filter(model, mixed, alpha=9.0, seed=42)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    n_good = sum(1 for i in ids if i < 1000)
    n_bad = len(ids) - n_good
    # high-quality docs survive essentially always; low-quality only as
    # the Pareto tail (P[draw > 1] = 2^-9 ≈ 0.2%)
    assert n_good >= 115
    assert n_bad <= 5
    # deterministic: same inputs → same kept set (content-hash coin)
    again = {r.doc_id for r in pareto_quality_filter(
        model, mixed, alpha=9.0, seed=42).select("doc_id").collect()}
    assert again == ids


def test_keep_col_mode_keeps_all_rows(spark, corpora, model):
    good, bad = corpora
    mixed = good.unionByName(bad)
    flagged = pareto_quality_filter(model, mixed, keep_col="keep")
    assert flagged.count() == mixed.count()
    assert {f.name for f in flagged.schema.fields} >= {
        "doc_id", "text", "quality_prob", "keep"}
    assert flagged.filter(F.col("keep")).count() > 0

"""ir_metrics / ir_summary (operators/evaluation.py): hand-computed goldens
for the trec_eval/ranx metric definitions the reference's quality gate uses
(docs/benchmarks/benchmark_scifact_docker.py), plus edge cases: query with
no relevant docs, relevant doc outside the top-k, perfect ranking."""

from __future__ import annotations

import math

import pytest

from next_plaid_spark.operators.evaluation import ir_metrics, ir_summary


@pytest.fixture(scope="module")
def toy(spark):
    # q1: retrieved [10, 20, 30]; relevant: 20 (rel 2), 30 (rel 1),
    #     99 (rel 1, NOT retrieved)
    # q2: retrieved [10, 20, 30]; no qrels at all
    # q3: perfect single hit at rank 1
    results = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3),
         (2, 10, 1), (2, 20, 2), (2, 30, 3),
         (3, 7, 1)],
        "query_id long, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, 20, 2), (1, 30, 1), (1, 99, 1),
         (3, 7, 1)],
        "query_id long, doc_id long, rel int",
    )
    return results, qrels


def test_hand_computed_golden(toy):
    results, qrels = toy
    rows = {r.query_id: r for r in ir_metrics(results, qrels, k=3).collect()}
    assert set(rows) == {1, 2, 3}

    dcg = 3.0 / math.log2(3) + 1.0 / math.log2(4)
    idcg = 3.0 / math.log2(2) + 1.0 / math.log2(3) + 1.0 / math.log2(4)
    r1 = rows[1]
    assert r1.ndcg_at_k == pytest.approx(dcg / idcg, abs=1e-9)
    assert r1.recall_at_k == pytest.approx(2 / 3, abs=1e-9)
    assert r1.precision_at_k == pytest.approx(2 / 3, abs=1e-9)
    # AP = (P@2 + P@3) / R = (1/2 + 2/3) / 3
    assert r1.ap_at_k == pytest.approx((0.5 + 2 / 3) / 3, abs=1e-9)
    assert r1.rr_at_k == pytest.approx(0.5, abs=1e-9)

    # no qrels → all zeros (query row still present)
    r2 = rows[2]
    assert (r2.ndcg_at_k, r2.recall_at_k, r2.precision_at_k, r2.ap_at_k,
            r2.rr_at_k) == (0.0, 0.0, 0.0, 0.0, 0.0)

    # perfect ranking → ndcg/recall/ap/rr all 1
    r3 = rows[3]
    assert r3.ndcg_at_k == pytest.approx(1.0, abs=1e-9)
    assert r3.recall_at_k == pytest.approx(1.0, abs=1e-9)
    assert r3.ap_at_k == pytest.approx(1.0, abs=1e-9)
    assert r3.rr_at_k == pytest.approx(1.0, abs=1e-9)
    assert r3.precision_at_k == pytest.approx(1 / 3, abs=1e-9)


def test_relevant_outside_topk_counts_in_denominators(spark):
    # the rel doc sits at rank 4 with k=3: zero hits, but R=1 so
    # recall/ap are 0/1 = 0, and idcg>0 keeps ndcg well-defined at 0
    results = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3), (1, 13, 4)],
        "query_id long, doc_id long, rank int",
    )
    qrels = spark.createDataFrame(
        [(1, 13, 3)], "query_id long, doc_id long, rel int"
    )
    (row,) = ir_metrics(results, qrels, k=3).collect()
    assert (row.ndcg_at_k, row.recall_at_k, row.ap_at_k, row.rr_at_k) == (
        0.0, 0.0, 0.0, 0.0,
    )


def test_summary_macro_average(toy):
    results, qrels = toy
    m = ir_metrics(results, qrels, k=3)
    (s,) = ir_summary(m).collect()
    per_q = {r.query_id: r for r in m.collect()}
    assert s.n_queries == 3
    want = sum(per_q[q].ndcg_at_k for q in per_q) / 3
    assert s.ndcg == pytest.approx(want, abs=1e-9)
    assert s.rr == pytest.approx((0.5 + 0.0 + 1.0) / 3, abs=1e-9)

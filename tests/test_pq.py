"""Product-quantization unit tests: exact fixed-point Lloyd determinism
(bit-identical codebooks across partitionings), encode plan shape (pure
zero-shuffle JVM map), ADC correctness on a hand-checkable corpus, and
recall of ADC top-k against exact cosine/L2 top-k."""

import math

import pytest
from pyspark.sql import functions as F

from searchgov_spider_spark.operators import pq


def _vecs_df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )


def _toy_corpus(n=60, dim=8, seed=7):
    # deterministic pseudo-random corpus clustered around 4 poles
    vecs = []
    s = seed
    for i in range(n):
        pole = i % 4
        v = []
        for j in range(dim):
            s = (s * 1103515245 + 12345) % (1 << 31)
            noise = (s / float(1 << 31) - 0.5) * 0.1
            v.append((1.0 if j % 4 == pole else 0.0) + noise)
        vecs.append(v)
    return vecs


def test_pq_train_partition_invariant(spark):
    vecs = _toy_corpus()
    d = _vecs_df(spark, vecs)
    b1 = pq.pq_train(d.repartition(1), dim=8, m=2, k=4, n_iters=3)
    b9 = pq.pq_train(d.repartition(9), dim=8, m=2, k=4, n_iters=3)
    assert b1 == b9  # exact float equality — integer sums are associative


def test_pq_encode_plan_pure_jvm_map(spark):
    d = _vecs_df(spark, _toy_corpus(n=16))
    books = pq.pq_train(d, dim=8, m=2, k=4, n_iters=1)
    plan = pq.pq_encode(d, books)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_pq_encode_codes_in_range(spark):
    d = _vecs_df(spark, _toy_corpus())
    books = pq.pq_train(d, dim=8, m=2, k=4, n_iters=2)
    rows = pq.pq_encode(d, books).collect()
    assert len(rows) == 60
    for r in rows:
        assert 0 <= r["code0"] < 4 and 0 <= r["code1"] < 4


def test_pq_adc_identity_query_ranks_first(spark):
    vecs = _toy_corpus()
    d = _vecs_df(spark, vecs)
    books = pq.pq_train(d, dim=8, m=2, k=4, n_iters=3)
    top = pq.ann_topk_pq(d, books, vecs[0], k=5).collect()
    # vec 0's own quantization cell minimizes the ADC distance to itself
    # among vectors sharing its codes; it must appear in the top-5
    assert 0 in [r["vec_id"] for r in top]
    dists = [r["adc_dist"] for r in top]
    assert dists == sorted(dists)


def test_pq_adc_candidates_above_chance(spark):
    """Raw ADC top-10: within-cell ties are unrecoverable from codes alone
    (resolved by id), so expect candidate-quality recall well above the
    10/120 chance level but below re-ranked recall."""
    vecs = _toy_corpus(n=120)
    d = _vecs_df(spark, vecs)
    q = vecs[3]
    books = pq.pq_train(d, dim=8, m=2, k=8, n_iters=3)
    got = {r["vec_id"] for r in pq.ann_topk_pq(d, books, q, k=10).collect()}
    exact = sorted(
        range(len(vecs)),
        key=lambda i: sum((vecs[i][j] - q[j]) ** 2 for j in range(8)),
    )[:10]
    recall = len(got & set(exact)) / 10.0
    assert recall >= 0.3, f"recall {recall}: {sorted(got)} vs {sorted(exact)}"


def test_pq_rerank_recall_vs_exact(spark):
    """The production two-stage (ADC top-r -> exact re-rank) must recover
    the exact-L2 top-10 nearly perfectly on a clustered corpus."""
    vecs = _toy_corpus(n=120)
    d = _vecs_df(spark, vecs)
    q = vecs[3]
    books = pq.pq_train(d, dim=8, m=2, k=8, n_iters=3)
    rows = pq.rerank_topk_pq(d, books, q, k=10, r=50).collect()
    got = [r["vec_id"] for r in rows]
    exact = sorted(
        range(len(vecs)),
        key=lambda i: (sum((vecs[i][j] - q[j]) ** 2 for j in range(8)), i),
    )[:10]
    recall = len(set(got) & set(exact)) / 10.0
    assert recall >= 0.9, f"recall {recall}: {sorted(got)} vs {sorted(exact)}"
    dists = [r["sq_dist"] for r in rows]
    assert dists == sorted(dists)
    assert got[0] == exact[0]  # the true nearest neighbor wins after re-rank


def test_pq_rerank_candidate_join_is_broadcast(spark):
    vecs = _toy_corpus(n=60)
    d = _vecs_df(spark, vecs)
    books = pq.pq_train(d, dim=8, m=2, k=4, n_iters=1)
    plan = (
        pq.rerank_topk_pq(d, books, vecs[0], k=5, r=20)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_pq_train_validates_inputs(spark):
    d = _vecs_df(spark, _toy_corpus(n=3))
    with pytest.raises(ValueError, match="divisible"):
        pq.pq_train(d, dim=8, m=3, k=2)
    with pytest.raises(ValueError, match="at least k"):
        pq.pq_train(d, dim=8, m=2, k=16)

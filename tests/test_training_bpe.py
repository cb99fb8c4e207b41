"""q108/q109 unit tests: the fixed-point logistic trainer and the iterative
BPE trainer — determinism (bit-identical across partitionings), learning
behaviour on separable data, and hand-computed BPE merge tables including
the greedy-overlap semantics."""

import pytest
from pyspark.sql import functions as F

from searchgov_spider_spark.operators import textstats, training


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )


# --- logistic regression -------------------------------------------------


def _sep_features(spark, n=40):
    # y = 1 iff x2 >= 0.45 (mirrors logreg_token_features' label rule);
    # x2 alternates 0.2 / 0.8 so the problem is linearly separable on x2.
    rows = [
        (i, 1.0, (i % 7) / 8.0, 0.8 if i % 2 == 0 else 0.2, 0.5, 1 if i % 2 == 0 else 0)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "doc_id BIGINT, x0 DOUBLE, x1 DOUBLE, x2 DOUBLE, x3 DOUBLE, y INT"
    )


def test_logreg_learns_separable(spark):
    feats = _sep_features(spark)
    history, acc, n = training.logistic_regression(
        feats, ["x0", "x1", "x2", "x3"], "y", lr=2.0, n_iters=10
    )
    assert n == 40
    assert len(history) == 10
    w = history[-1]
    # the separating feature must carry the largest positive weight
    assert w[2] > 0
    assert w[2] == max(w)
    assert acc == 1.0


def test_logreg_partition_invariant(spark):
    """The whole point of the 2^20 fixed-point bigint gradients: identical
    weights (bit-for-bit) regardless of how rows land in partitions."""
    feats = _sep_features(spark, n=37)
    h1, a1, _ = training.logistic_regression(
        feats.repartition(1), ["x0", "x1", "x2", "x3"], "y", n_iters=4
    )
    h13, a13, _ = training.logistic_regression(
        feats.repartition(13), ["x0", "x1", "x2", "x3"], "y", n_iters=4
    )
    assert h1 == h13  # exact float equality — integer sums are associative
    assert a1 == a13


def test_logreg_token_features_label_rule(spark):
    d = _docs_df(spark, ["aa bb cc", "aa aa aa aa"])
    rows = {r["doc_id"]: r for r in training.logreg_token_features(d).collect()}
    assert rows[0]["x2"] == 1.0 and rows[0]["y"] == 1
    assert rows[1]["x2"] == 0.25 and rows[1]["y"] == 0
    assert rows[0]["x1"] == 3 / 64.0
    assert rows[0]["x3"] == (6 / 3) / 8.0


# --- BPE training ---------------------------------------------------------


def test_bpe_train_hand_computed(spark):
    corpus = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    out = textstats.bpe_train(_docs_df(spark, [corpus]), n_merges=5).collect()
    got = [(r["merge_rank"], r["pair"], r["merged"], r["n"]) for r in out]
    assert got == [
        (1, "e s", "es", 9),
        (2, "es t", "est", 9),
        (3, "l o", "lo", 7),
        (4, "lo w", "low", 7),
        (5, "e w", "ew", 6),
    ]


def test_bpe_train_greedy_overlap(spark):
    # "a a a a" under merge (a,a) must become "aa aa" (left-to-right,
    # non-overlapping), so iteration 2 finds ("aa aa", 3).
    out = textstats.bpe_train(_docs_df(spark, ["aaaa aaaa aaaa"]), n_merges=4).collect()
    got = [(r["pair"], r["merged"], r["n"]) for r in out]
    assert got == [("a a", "aa", 9), ("aa aa", "aaaa", 3)]  # stops early: n<2 next


def test_bpe_train_partition_invariant(spark):
    texts = [f"token{i % 4} stream stream merge merge merge" for i in range(24)]
    a = textstats.bpe_train(_docs_df(spark, texts).repartition(1), n_merges=6).collect()
    b = textstats.bpe_train(_docs_df(spark, texts).repartition(11), n_merges=6).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 6


# --- BPE encoding ----------------------------------------------------------


def test_bpe_encode_hand_computed(spark):
    # merges (e,s)->(es,t): "newest" -> n e w est (4), "widest" -> w i d est (4)
    d = _docs_df(spark, ["newest widest", "es es", ""])
    merges = [("e", "s"), ("es", "t")]
    rows = {r["doc_id"]: r for r in textstats.bpe_encode(d, merges).collect()}
    assert (rows[0]["n_words"], rows[0]["n_bpe_tokens"]) == (2, 8)
    assert rows[0]["chars_per_token"] == 12 / 8
    assert (rows[1]["n_words"], rows[1]["n_bpe_tokens"]) == (2, 2)
    assert (rows[2]["n_words"], rows[2]["n_bpe_tokens"]) == (0, 0)
    assert rows[2]["chars_per_token"] is None


def test_bpe_encode_greedy_overlap(spark):
    # "aaaa" under (a,a) -> "aa aa" (2 symbols), then (aa,aa) -> "aaaa" (1);
    # odd-length "aaaaa" -> "aa aa a" -> "aaaa a" (2).
    d = _docs_df(spark, ["aaaa aaaaa"])
    rows = textstats.bpe_encode(d, [("a", "a"), ("aa", "aa")]).collect()
    assert rows[0]["n_bpe_tokens"] == 1 + 2


def test_bpe_encode_engines_equal(spark):
    texts = ["the quick brown fox 123", "thee theme anthem", "", "a b ab abab"]
    d = _docs_df(spark, texts)
    merges = [("t", "h"), ("th", "e"), ("a", "b")]
    sql_rows = sorted(map(tuple, textstats.bpe_encode(d, merges, impl="sql").collect()))
    pd_rows = sorted(map(tuple, textstats.bpe_encode(d, merges, impl="pandas").collect()))
    assert sql_rows == pd_rows


def test_bpe_encode_sql_plan_is_pure_jvm_map(spark):
    """The SQL engine must be a zero-shuffle, zero-Python map: no Exchange,
    no ArrowEvalPython/BatchEvalPython in the plan."""
    d = _docs_df(spark, ["some text here"])
    plan = textstats.bpe_encode(d, [("t", "e")])._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_bpe_train_then_encode_roundtrip(spark):
    """Encoding with the learned merges must shrink token counts vs raw
    char counts and stay consistent between train's own re-segmentation
    and encode (the 'low/lower/newest/widest' classic)."""
    corpus = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    d = _docs_df(spark, [corpus])
    merge_df = textstats.bpe_train(d, n_merges=5)
    merges = [tuple(r["pair"].split(" ")) for r in merge_df.orderBy("merge_rank").collect()]
    row = textstats.bpe_encode(d, merges).collect()[0]
    # 16 words; low->1 sym (5x), lower->3 (2x: low e r), newest->3 (6x: n ew est),
    # widest->4 (3x: w i d est)
    assert row["n_words"] == 16
    assert row["n_bpe_tokens"] == 5 * 1 + 2 * 3 + 6 * 3 + 3 * 4

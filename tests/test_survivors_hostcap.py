"""Round-5 curation tail operators: per-cluster survivor selection,
embedding-space decontamination, and skew-safe hot-host capping.

Each is checked against a pure-Python re-derivation plus a plan audit
pinning its scale story (agg-not-window, shuffle-free map, prefilter+guard
exactness)."""

import hashlib
import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from searchgov_spider_spark.operators import curation, dedup, similarity


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class TestSurvivorSelection:
    LABELS = [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 5)]
    DOCS = [
        (1, "aaaa"),       # len 4
        (2, "bbbbbbbb"),   # len 8 -> survivor of cluster 1
        (3, "cccccccc"),   # len 8, tie with 2 -> min id wins (2)
        (4, "d"),          # singleton cluster -> its own survivor
        (5, "ee"),
        (6, "ff"),         # tie at len 2 -> min id 5 wins
    ]

    def _frames(self, spark):
        labels = spark.createDataFrame(self.LABELS, ["doc_id", "label"])
        docs = spark.createDataFrame(self.DOCS, ["doc_id", "text"])
        return labels, docs

    def test_max_quality_min_id_tiebreak(self, spark):
        labels, docs = self._frames(spark)
        rows = {r.doc_id: r for r in dedup.survivor_selection(labels, docs).collect()}
        assert {i: r.survivor_id for i, r in rows.items()} == {
            1: 2, 2: 2, 3: 2, 4: 4, 5: 5, 6: 5
        }
        assert {i for i, r in rows.items() if r.keep} == {2, 4, 5}
        # every input row comes back exactly once
        assert sorted(rows) == [1, 2, 3, 4, 5, 6]

    def test_custom_quality_column(self, spark):
        labels, docs = self._frames(spark)
        scored = docs.withColumn("score", 100.0 - F.col("doc_id"))  # lower id = better
        rows = dedup.survivor_selection(labels, scored, quality_col="score").collect()
        got = {r.doc_id: r.survivor_id for r in rows}
        assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}

    def test_agg_not_window(self, spark):
        labels, docs = self._frames(spark)
        plan = plan_of(dedup.survivor_selection(labels, docs))
        # scale story: partial-agg'd max(struct), never a per-cluster sort
        # (max over a struct lowers to SortAggregate — still partial+final)
        assert "Window" not in plan
        assert "Aggregate" in plan


class TestSemanticDecontaminate:
    def _corpus(self, spark):
        rows = [
            (1, [1.0, 0.0, 0.0]),   # exact copy of eval vec -> contaminated
            (2, [0.0, 1.0, 0.0]),   # orthogonal -> clean
            (3, [0.9, 0.1, 0.0]),   # near eval -> cosine ~0.9939 -> contaminated
            (4, [-1.0, 0.0, 0.0]),  # anti-parallel -> clean
        ]
        return spark.createDataFrame(rows, ["vec_id", "embedding"])

    def test_flags_match_pure_python(self, spark):
        import numpy as np

        evals = [[1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]
        got = {
            r.vec_id: (r.max_eval_cosine, r.contaminated)
            for r in similarity.semantic_decontaminate(
                self._corpus(spark), evals, threshold=0.9
            ).collect()
        }
        corpus = {1: [1.0, 0.0, 0.0], 2: [0.0, 1.0, 0.0], 3: [0.9, 0.1, 0.0], 4: [-1.0, 0.0, 0.0]}
        for vid, vec in corpus.items():
            v = np.array(vec)
            mx = max(float(v @ np.array(e)) / (np.linalg.norm(v) * np.linalg.norm(e)) for e in evals)
            assert got[vid][0] == pytest.approx(round(mx, 6), abs=1e-9)
            assert got[vid][1] == (mx >= 0.9)
        assert {vid for vid, (_, c) in got.items() if c} == {1, 3}

    def test_pure_map_zero_shuffle(self, spark):
        plan = plan_of(
            similarity.semantic_decontaminate(self._corpus(spark), [[1.0, 0.0, 0.0]])
        )
        assert "Exchange" not in plan   # the 100-TB side never moves
        assert "Join" not in plan       # eval side is literal, not a join

    def test_input_validation(self, spark):
        with pytest.raises(ValueError, match="non-empty"):
            similarity.semantic_decontaminate(self._corpus(spark), [])
        with pytest.raises(ValueError, match="max_literal"):
            similarity.semantic_decontaminate(
                self._corpus(spark), [[1.0, 0.0, 0.0]] * 5, max_literal=4
            )


def _naive_host_cap(rows, cap):
    """Reference semantics: per host, rank by (md5(str(id)), id), keep <= cap."""
    by_host = {}
    for host, did in rows:
        by_host.setdefault(host, []).append(did)
    keep = set()
    for host, ids in by_host.items():
        ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        keep.update((host, i) for i in ids[:cap])
    return keep


class TestHostCap:
    def _docs(self, spark, parts=4):
        # Zipf-ish: one hot host with 200 rows, a mid host with 30, tiny tails
        rows = (
            [("hot.gov", i) for i in range(200)]
            + [("mid.gov", 1000 + i) for i in range(30)]
            + [("tiny.gov", 2000), ("tiny.gov", 2001)]
            + [("one.gov", 3000)]
        )
        return spark.createDataFrame(rows, ["source", "doc_id"]).repartition(parts)

    def test_matches_naive_window_semantics(self, spark):
        docs = self._docs(spark)
        got = {
            (r.source, r.doc_id)
            for r in curation.host_cap(docs, cap=10, group_col="source").collect()
        }
        rows = [(r.source, r.doc_id) for r in docs.collect()]
        assert got == _naive_host_cap(rows, 10)
        # small hosts come through whole
        assert sum(1 for h, _ in got if h == "tiny.gov") == 2
        assert sum(1 for h, _ in got if h == "one.gov") == 1
        assert sum(1 for h, _ in got if h == "hot.gov") == 10

    def test_guard_path_is_exact_under_starved_prefilter(self, spark):
        # safety so small the prefilter under-delivers on every host: the
        # counts-anchored guard must re-rank exactly, including hosts whose
        # prefilter kept ZERO rows.
        docs = self._docs(spark)
        got = {
            (r.source, r.doc_id)
            for r in curation.host_cap(docs, cap=10, group_col="source", safety=0.001).collect()
        }
        rows = [(r.source, r.doc_id) for r in docs.collect()]
        assert got == _naive_host_cap(rows, 10)

    def test_partition_invariance(self, spark):
        a = {
            (r.source, r.doc_id)
            for r in curation.host_cap(self._docs(spark, 2), cap=5, group_col="source").collect()
        }
        b = {
            (r.source, r.doc_id)
            for r in curation.host_cap(self._docs(spark, 9), cap=5, group_col="source").collect()
        }
        assert a == b

    def test_counts_side_broadcasts(self, spark):
        plan = plan_of(curation.host_cap(self._docs(spark), cap=10, group_col="source"))
        assert "BroadcastHashJoin" in plan  # counts join back map-side

"""Corpus-health metrics: n-gram diversity, Heap's-law fit, per-source KL
drift (textstats.ngram_diversity / heaps_fit / source_kl_drift).

Parity oracles here are independent pure-Python re-derivations; the DuckDB
SQL oracles run in test_entry_oracle (q100-q102).
"""

import math
import re

import pytest
from pyspark.sql import functions as F

from searchgov_spider_spark.operators import textstats


def _toks(text):
    return re.findall(r"[a-z0-9]+", text.lower())


def _grams(text, n):
    t = _toks(text)
    if n == 1:
        return t
    if len(t) >= n:
        return [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]
    return [" ".join(t)]


DOCS = [
    (0, "s0", "the cat sat on the mat the cat sat"),
    (1, "s0", "the dog ran over the hill the dog ran"),
    (2, "s1", "alpha beta gamma delta epsilon zeta eta theta"),
    (3, "s1", "alpha beta gamma alpha beta gamma alpha beta"),
    (4, "s2", "one two three four five six seven eight nine ten"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, source string, text string")


class TestNgramDiversity:
    def test_matches_pure_python(self, spark, docs):
        got = {
            (r.source, r.n): (r.total_ngrams, r.distinct_ngrams, r.diversity)
            for r in textstats.ngram_diversity(docs).collect()
        }
        for src in ("s0", "s1", "s2"):
            texts = [t for _, s, t in DOCS if s == src]
            for n in (1, 2, 3):
                grams = [g for t in texts for g in _grams(t, n)]
                total, distinct = len(grams), len(set(grams))
                assert got[(src, n)] == (
                    total,
                    distinct,
                    round(distinct / total, 6),
                ), (src, n)

    def test_boilerplate_source_scores_lower(self, spark, docs):
        got = {(r.source, r.n): r.diversity for r in textstats.ngram_diversity(docs).collect()}
        # s1 doc 3 is a repeated template; s2 is all-unique
        assert got[("s1", 3)] < got[("s2", 3)]

    def test_partial_agg_in_plan(self, spark, docs):
        plan = textstats.ngram_diversity(docs)._jdf.queryExecution().executedPlan().toString()
        assert "partial" in plan.lower()  # map-side combine before both shuffles


class TestHeapsFit:
    def test_matches_pure_python_ols(self, spark, docs):
        row = textstats.heaps_fit(docs, points=4, gram_n=1).collect()[0]
        max_id = 4
        ts = sorted({(k * max_id) // 4 for k in range(1, 5)})
        pts = []
        for t in ts:
            upto = [(i, txt) for i, _, txt in DOCS if i <= t]
            n_tokens = sum(len(_toks(txt)) for _, txt in upto)
            vocab = len({w for _, txt in upto for w in _toks(txt)})
            pts.append((math.log(n_tokens), math.log(vocab)))
        n = len(pts)
        mx = sum(x for x, _ in pts) / n
        my = sum(y for _, y in pts) / n
        mxy = sum(x * y for x, y in pts) / n
        mxx = sum(x * x for x, _ in pts) / n
        slope = (mxy - mx * my) / (mxx - mx * mx)
        assert row.n_points == n
        assert row.heaps_beta == pytest.approx(round(slope, 6), abs=1e-9)
        assert row.heaps_lnk == pytest.approx(round(my - slope * mx, 6), abs=1e-9)

    def test_saturated_vocabulary_yields_zero_beta(self, spark):
        # every doc repeats the same two words: V is constant -> beta == 0.0
        rows = [(i, "s", "alpha beta alpha beta") for i in range(8)]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        row = textstats.heaps_fit(df, points=4, gram_n=1).collect()[0]
        assert row.heaps_beta == 0.0
        assert str(row.heaps_beta) == "0.0"  # -0.0 folded


class TestSourceKlDrift:
    def test_matches_pure_python_kl(self, spark, docs):
        got = {r.source: (r.n_tokens, r.kl) for r in textstats.source_kl_drift(docs).collect()}
        from collections import Counter

        per_src = {}
        for _, s, t in DOCS:
            per_src.setdefault(s, Counter()).update(_toks(t))
        corpus = Counter()
        for c in per_src.values():
            corpus.update(c)
        n_all = sum(corpus.values())
        for s, c in per_src.items():
            n_s = sum(c.values())
            kl = sum(
                (v / n_s) * math.log((v / n_s) / (corpus[w] / n_all)) for w, v in c.items()
            )
            assert got[s][0] == n_s
            assert got[s][1] == pytest.approx(round(kl, 6), abs=2e-6)

    def test_nonnegative_and_uniform_source_is_small(self, spark):
        # two sources with IDENTICAL distributions: both KLs must be ~0
        rows = [(0, "a", "x y z x y z"), (1, "b", "x y z x y z")]
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        for r in textstats.source_kl_drift(df).collect():
            assert r.kl == pytest.approx(0.0, abs=1e-9)

    def test_partition_invariance(self, spark, docs):
        a = sorted(map(tuple, textstats.source_kl_drift(docs).collect()))
        b = sorted(map(tuple, textstats.source_kl_drift(docs.repartition(7)).collect()))
        assert a == b

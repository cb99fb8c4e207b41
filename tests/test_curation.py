"""Curation operators: decontamination + deterministic stratified sampling.

Correctness vs pure-Python re-derivations AND plan audits pinning the scale
story (eval side broadcast, sampling shuffle-free)."""

import hashlib
import io
import re
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from searchgov_spider_spark.operators import curation


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _grams(text: str, k: int) -> set[str]:
    toks = re.findall(r"[a-z0-9]+", text.lower())
    if len(toks) >= k:
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    return {" ".join(toks)}


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank"),
    (1, "completely unrelated text about tax forms and federal filing deadlines"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank today"),  # shares 8-grams with 0
    (3, "short doc"),  # below k -> whole-doc gram
    (4, "short doc"),  # identical short doc
    (5, "agency publishes quarterly statistics on regional employment and wages"),
]


class TestDecontaminate:
    def test_matches_pure_python(self, spark):
        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        eval_docs = docs.filter(F.col("doc_id").isin(0, 3))
        train = docs.filter(~F.col("doc_id").isin(0, 3))
        got = {
            r["doc_id"]: (r["n_hit_ngrams"], r["contaminated"])
            for r in curation.decontaminate(train, eval_docs, n=8).collect()
        }
        ev = _grams(DOCS[0][1], 8) | _grams(DOCS[3][1], 8)
        expected = {
            d: (len(_grams(t, 8) & ev), len(_grams(t, 8) & ev) > 0)
            for d, t in DOCS
            if d not in (0, 3)
        }
        assert got == expected
        assert got[2][1] is True  # near-verbatim long doc flagged
        assert got[4][1] is True  # identical short doc flagged via whole-doc gram
        assert got[1][1] is False and got[5][1] is False

    def test_eval_side_is_broadcast(self, spark):
        """Scale shape: the gram join must broadcast the (small) eval side so
        the 100-TB training side never shuffles for the join; the only hash
        exchange is the per-doc hit aggregation."""
        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        out = curation.decontaminate(docs, docs.limit(2), n=8)
        plan = plan_of(out)
        assert "BroadcastHashJoin" in plan


class TestStratifiedSample:
    CUTOFFS = {"en": "8000", "zh": "4000"}

    def _docs(self, spark, n=400):
        rows = [(i, ["en", "zh", "de"][i % 3], f"src{i % 5}") for i in range(n)]
        return spark.createDataFrame(rows, "doc_id long, lang string, source string")

    def test_matches_md5_rule_and_is_deterministic(self, spark):
        docs = self._docs(spark)
        sampled = curation.stratified_sample(docs, self.CUTOFFS, default_cutoff="2000")
        got = {r["doc_id"] for r in sampled.collect()}
        expected = {
            i
            for i in range(400)
            if hashlib.md5(str(i).encode()).hexdigest()[:4]
            < self.CUTOFFS.get(["en", "zh", "de"][i % 3], "2000")
        }
        assert got == expected
        # partition-layout independence: same sample at any partitioning
        # (the property df.sample does NOT have)
        re_got = {
            r["doc_id"]
            for r in curation.stratified_sample(
                docs.repartition(13), self.CUTOFFS, default_cutoff="2000"
            ).collect()
        }
        assert re_got == got

    def test_no_shuffle_in_plan(self, spark):
        """Map-side only: broadcast rates dim, no hash-partition exchange."""
        plan = plan_of(curation.stratified_sample(self._docs(spark), self.CUTOFFS))
        assert "Exchange hashpartitioning" not in plan
        assert "BroadcastHashJoin" in plan

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


class TestPiiRedact:
    def test_counts_and_masks(self, spark):
        rows = [
            (0, "write to jane.doe+tag@sub.example.gov or call 202-555-0142 today"),
            (1, "ssn 123-45-6789 appears once; 999-999-9999 is a phone not an ssn"),
            (2, "no pii here at all"),
            (3, "two mails a@b.gov c.d@e.org and ssn-adjacent 12-34-5678 (not an ssn)"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r.asDict() for r in curation.pii_redact(docs).collect()}
        assert (got[0]["n_emails"], got[0]["n_ssns"], got[0]["n_phones"]) == (1, 0, 1)
        assert got[0]["redacted_text"] == "write to <EMAIL> or call <PHONE> today"
        assert (got[1]["n_emails"], got[1]["n_ssns"], got[1]["n_phones"]) == (0, 1, 1)
        assert got[1]["redacted_text"] == "ssn <SSN> appears once; <PHONE> is a phone not an ssn"
        assert got[2]["redacted_text"] == rows[2][1]
        assert (got[3]["n_emails"], got[3]["n_ssns"], got[3]["n_phones"]) == (2, 0, 0)

    def test_map_side_only(self, spark):
        docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
        plan = plan_of(curation.pii_redact(docs))
        assert "Exchange" not in plan  # linear codegen scan, zero shuffles
        # no UDF in the hot path (the only Python in the plan may be the
        # createDataFrame source RDD)
        assert "EvalPython" not in plan


class TestLineDedup:
    def test_matches_pure_python(self, spark):
        corpus = {
            0: ["alpha beta", "gamma delta", "alpha beta"],  # self-dup at pos 2
            1: ["gamma delta", "unique one"],  # cross-doc dup at pos 0
            2: ["unique two", "alpha beta"],
            3: ["gamma delta"],  # fully removed -> empty text
        }
        docs = spark.createDataFrame(list(corpus.items()), "doc_id long, lines array<string>")
        got = {r["doc_id"]: r.asDict() for r in curation.line_dedup(docs).collect()}

        seen: set[str] = set()
        expected = {}
        for d in sorted(corpus):  # first occurrence = min (doc_id, pos)
            kept = []
            removed = 0
            for line in corpus[d]:
                if line in seen:
                    removed += 1
                else:
                    seen.add(line)
                    kept.append(line)
            expected[d] = (" ".join(kept), len(kept), removed)
        for d, (text, n_kept, n_removed) in expected.items():
            assert (got[d]["clean_text"], got[d]["n_kept"], got[d]["n_removed"]) == (
                text,
                n_kept,
                n_removed,
            ), d
        assert got[3]["clean_text"] == ""


class TestRepetitionStats:
    def test_formula_by_hand(self, spark):
        from searchgov_spider_spark.operators import textstats

        # "ab cd" repeated 5x: top 2-gram "ab cd" covers 5*5=25 chars of 29
        looped = " ".join(["ab cd"] * 5)  # 29 chars
        # long enough that no single bigram's chars exceed 20% of the doc
        clean = " ".join(f"word{i:02d}" for i in range(30))
        docs = spark.createDataFrame([(0, looped), (1, clean)], "doc_id long, text string")
        got = {r["doc_id"]: r.asDict() for r in textstats.repetition_stats(docs).collect()}
        assert got[0]["top2gram_char_frac"] == round(25 / 29, 6)
        # 5-grams of the loop: 6 grams, every one a duplicate of another?
        # grams are the 6 windows of 10 tokens... verify against brute force
        toks = looped.split()
        g5 = [" ".join(toks[i : i + 5]) for i in range(len(toks) - 4)]
        from collections import Counter

        c = Counter(g5)
        dup_mass = sum(cnt * len(g) for g, cnt in c.items() if cnt > 1)
        assert got[0]["dup5gram_char_frac"] == round(dup_mass / 29, 6)
        assert got[0]["repetitive"] is True
        assert got[1]["repetitive"] is False and got[1]["dup5gram_char_frac"] == 0.0


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


class TestC4LineFilters:
    def test_rules_hand_checked(self, spark):
        from searchgov_spider_spark.operators import curation

        rows = [
            # 3 good lines -> doc kept
            (0, "one two three.\nfour five six!\nseven eight nine?"),
            # good lines but a '{' tell -> doc dropped ('{' also sinks its line)
            (1, "one two three.\nfour five six.\nseven eight nine. {"),
            # lorem ipsum tell -> dropped
            (2, "one two three.\nfour five six.\nseven eight lorem ipsum nine."),
            # line-level rules: no terminal punct / too few words / javascript
            (3, "no terminal punct here\ntwo words.\nenable javascript to view.\na good line stays here.\nsecond good line is kept.\nthird good line also kept."),
            (4, ""),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r.asDict() for r in curation.c4_line_filters(docs).collect()}
        assert got[0]["doc_keep"] and got[0]["n_kept_lines"] == 3
        assert not got[1]["doc_keep"] and got[1]["n_kept_lines"] == 2
        assert not got[2]["doc_keep"]
        assert got[3]["n_lines"] == 6 and got[3]["n_kept_lines"] == 3
        assert got[3]["doc_keep"]
        assert got[3]["kept_text"] == (
            "a good line stays here.\nsecond good line is kept.\nthird good line also kept."
        )
        assert got[4]["n_kept_lines"] == 0 and not got[4]["doc_keep"]

    def test_pure_map_plan(self, spark):
        """100-TB contract: the whole filter is map-side codegen — no
        exchange, no Python stage."""
        import io
        from contextlib import redirect_stdout

        from searchgov_spider_spark.operators import curation

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        buf = io.StringIO()
        with redirect_stdout(buf):
            curation.c4_line_filters(docs).explain("simple")
        plan = buf.getvalue()
        assert "Exchange" not in plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestVocabCoverage:
    def test_hand_checked_and_topk_plan(self, spark):
        import io
        from contextlib import redirect_stdout

        from searchgov_spider_spark.operators import textstats

        rows = [(0, "a a a b b c"), (1, "a b d")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        out = textstats.vocab_coverage(docs, top_k=3).collect()
        assert [(r["token"], r["n"], r["rank"]) for r in out] == [
            ("a", 4, 1), ("b", 3, 2), ("c", 1, 3)
        ]
        # corpus = 9 tokens; shares and cumulative coverage over the top-3
        assert out[0]["share"] == round(4 / 9, 6)
        assert out[1]["cum_coverage"] == round(7 / 9, 6)
        assert out[2]["cum_coverage"] == round(8 / 9, 6)

        # the full vocab is never globally sorted: top-k must be
        # TakeOrderedAndProject, not a global Sort over the counts
        buf = io.StringIO()
        with redirect_stdout(buf):
            textstats.vocab_coverage(docs, top_k=3).explain("simple")
        assert "TakeOrderedAndProject" in buf.getvalue()


class TestWeightedSample:
    def _docs(self, spark, n=200):
        return spark.range(n).select(
            F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).cast("long").alias("weight")
        )

    def test_matches_pure_python_aes(self, spark):
        # re-derive Efraimidis-Spirakis keys independently with hashlib/math
        import math

        rows = curation.weighted_sample(self._docs(spark), k=10).collect()
        expected = []
        for i in range(200):
            w = i % 7 + 1
            v = int(hashlib.md5(f"{i}#ws".encode()).hexdigest()[:8], 16)
            u = (v + 0.5) / 2**32
            expected.append((round(math.log(u) / w, 6), i))
        expected.sort(key=lambda t: (-t[0], t[1]))
        assert [(r.sample_key, r.id) for r in rows] == [
            (k, i) for k, i in expected[:10]
        ]
        assert [r.rank for r in rows] == list(range(1, 11))

    def test_higher_weight_wins_more_slots(self, spark):
        # weight 1000 vs 1: the heavy half must dominate the sample
        docs = spark.range(400).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 200, F.lit(1000.0)).otherwise(F.lit(1.0)).alias("weight"),
        )
        rows = curation.weighted_sample(docs, k=50).collect()
        heavy = sum(1 for r in rows if r.id < 200)
        assert heavy >= 45

    def test_partition_invariance(self, spark):
        a = curation.weighted_sample(self._docs(spark), k=15).collect()
        b = curation.weighted_sample(self._docs(spark).repartition(11), k=15).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_topk_compiles_to_take_ordered(self, spark):
        plan = plan_of(
            curation.weighted_sample(self._docs(spark), k=10).select(
                "id", "weight", "sample_key"
            )
        )
        assert "TakeOrderedAndProject" in plan


class TestTemperatureAllocation:
    def _strata(self, spark):
        return spark.createDataFrame(
            [("en", 800), ("de", 120), ("fr", 60), ("zh", 15), ("yo", 5)],
            "lang string, n_docs long",
        )

    def test_allocations_sum_exactly_to_budget(self, spark):
        rows = curation.temperature_allocation(self._strata(spark), budget=1000).collect()
        assert sum(r.alloc for r in rows) == 1000

    def test_alpha_flattens_toward_uniform(self, spark):
        # alpha=1 is proportional; alpha->0 approaches uniform: the rare
        # stratum's share must rise monotonically as alpha drops
        shares = {}
        for alpha in (1.0, 0.3, 0.01):
            rows = curation.temperature_allocation(
                self._strata(spark), budget=10_000, alpha=alpha
            ).collect()
            shares[alpha] = {r.stratum: r.alloc for r in rows}
        assert shares[1.0]["yo"] < shares[0.3]["yo"] < shares[0.01]["yo"]
        assert shares[1.0]["en"] > shares[0.3]["en"] > shares[0.01]["en"]
        # proportional sanity at alpha=1: en gets ~800/1000 of the budget
        assert abs(shares[1.0]["en"] - 8000) <= 10

    def test_matches_pure_python_hamilton(self, spark):
        rows = curation.temperature_allocation(
            self._strata(spark), budget=777, alpha=0.3
        ).collect()
        counts = {"en": 800, "de": 120, "fr": 60, "zh": 15, "yo": 5}
        total = sum(counts.values())
        ppm = {k: round((v / total) ** 0.3 * 1_000_000) for k, v in counts.items()}
        wtotal = sum(ppm.values())
        quotas = {k: 777 * v / wtotal for k, v in ppm.items()}
        base = {k: int(quotas[k]) for k in quotas}
        left = 777 - sum(base.values())
        order = sorted(quotas, key=lambda k: (-round(quotas[k] - base[k], 6), k))
        expect = {k: base[k] + (1 if order.index(k) < left else 0) for k in quotas}
        assert {r.stratum: r.alloc for r in rows} == expect


class TestStratifiedWeightedSample:
    def _data(self, spark, n=300, parts=1):
        df = spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 5).cast("int").alias("stratum"),
            (F.col("id") % 7 + 1).cast("double").alias("weight"),
        )
        return df.repartition(parts) if parts > 1 else df

    def _alloc(self, spark):
        return spark.createDataFrame(
            [(0, 10), (1, 3), (2, 0), (3, 7), (4, 1)], "stratum int, alloc int"
        )

    def test_quota_exact_per_stratum(self, spark):
        rows = curation.stratified_weighted_sample(
            self._data(spark), self._alloc(spark), "stratum"
        ).collect()
        per = {}
        for r in rows:
            per[r.stratum] = per.get(r.stratum, 0) + 1
        assert per == {0: 10, 1: 3, 3: 7, 4: 1}  # stratum 2 quota 0 -> absent
        for r in rows:
            assert 1 <= r.sample_rank

    def test_matches_pure_python_per_stratum_aes(self, spark):
        import math

        rows = curation.stratified_weighted_sample(
            self._data(spark), self._alloc(spark), "stratum"
        ).collect()
        expected = {}
        for i in range(300):
            s, w = i % 5, i % 7 + 1
            v = int(hashlib.md5(f"{i}#sws".encode()).hexdigest()[:8], 16)
            key = round(math.log((v + 0.5) / 2**32) / w, 6)
            expected.setdefault(s, []).append((key, i))
        quota = {0: 10, 1: 3, 2: 0, 3: 7, 4: 1}
        want = set()
        for s, items in expected.items():
            items.sort(key=lambda t: (-t[0], t[1]))
            want |= {(s, i) for _, i in items[: quota[s]]}
        assert {(r.stratum, r.doc_id) for r in rows} == want

    def test_partition_invariance_two_phase_topk(self, spark):
        # phase-1 local pruning must not change the result under any layout
        a = curation.stratified_weighted_sample(
            self._data(spark, parts=1), self._alloc(spark), "stratum"
        ).collect()
        b = curation.stratified_weighted_sample(
            self._data(spark, parts=13), self._alloc(spark), "stratum"
        ).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_alloc_side_broadcasts(self, spark):
        plan = plan_of(
            curation.stratified_weighted_sample(
                self._data(spark), self._alloc(spark), "stratum"
            )
        )
        assert "BroadcastHashJoin" in plan


class TestGroupSplit:
    def _docs(self, spark, parts=1):
        df = spark.range(500).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("host"), (F.col("id") % 40).cast("string")).alias("source"),
        )
        return df.repartition(parts) if parts > 1 else df

    def test_group_coherent_and_matches_pure_python(self, spark):
        rows = curation.group_split(self._docs(spark), "source").collect()
        per_group = {}
        for r in rows:
            per_group.setdefault(r.source, set()).add(r.split)
        # leakage guard: every host maps to exactly one split
        assert all(len(s) == 1 for s in per_group.values())
        for g, s in per_group.items():
            v = int(hashlib.md5(f"{g}#split".encode()).hexdigest()[:8], 16)
            u = (v + 0.5) / 2**32
            want = "train" if u < 0.8 else ("val" if u < 0.9 else "test")
            assert s == {want}

    def test_partition_invariant_pure_map(self, spark):
        a = sorted(map(tuple, curation.group_split(self._docs(spark), "source").collect()))
        b = sorted(map(tuple, curation.group_split(self._docs(spark, parts=9), "source").collect()))
        assert a == b
        plan = plan_of(curation.group_split(self._docs(spark), "source"))
        assert "Exchange" not in plan  # zero shuffle: split is a pure map

    def test_custom_fraction_cutoffs_are_exact_doubles(self, spark):
        rows = curation.group_split(
            self._docs(spark), "source", splits=[("a", 0.6), ("b", 0.2), ("c", 0.2)]
        ).collect()
        for r in rows:
            v = int(hashlib.md5(f"{r.source}#split".encode()).hexdigest()[:8], 16)
            u = (v + 0.5) / 2**32
            want = "a" if u < 0.6 else ("b" if u < 0.8 else "c")
            assert r.split == want

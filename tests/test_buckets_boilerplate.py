"""CCNet perplexity bucketing + host-boilerplate stripping.

Both are compositions of proven operators (q47 surprisal + q95 HDR sketch;
q86 boilerplate discovery) — tests re-derive the full pipeline in pure
Python and pin the plan shapes (broadcast cutoffs, no corpus-wide window).
"""

import io
import math
import re
from collections import Counter
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from searchgov_spider_spark.operators import curation


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _round6(x: float) -> float:
    # mirrors Spark/DuckDB round-half-up at 6dp for positive values
    return math.floor(x * 1e6 + 0.5) / 1e6


def _hdr_tercile_cuts(values):
    """Pure-Python HDR: same integer octave/sub-bucket, type-1 rank rule,
    exact-double midpoint."""
    idxs = []
    for v in values:
        v = max(int(v), 1)
        o = v.bit_length() - 1
        s = ((v * 16) >> o) - 16
        idxs.append(o * 16 + s)
    hist = sorted(Counter(idxs).items())
    n = len(idxs)
    cuts = []
    for num, den in ((1, 3), (2, 3)):
        target = (num * n + den - 1) // den
        cum = 0
        for idx, cnt in hist:
            cum += cnt
            if cum >= target:
                cuts.append(round((33 + 2 * (idx % 16)) * 2.0 ** (idx // 16 - 5), 4))
                break
    return cuts  # [cut_head, cut_mid]


class TestPerplexityBuckets:
    def _docs(self, spark, parts=4):
        # two languages; per-language a spread of rare-vs-common token mixes
        common = "the data table row "
        rows = []
        for i in range(30):
            rare = " ".join(f"tok{i}x{j}" for j in range(i % 7))
            rows.append((i, (common * 3 + rare).strip(), "en" if i % 2 == 0 else "de"))
        return spark.createDataFrame(rows, ["doc_id", "text", "lang"]).repartition(parts)

    def _expected(self, rows):
        # pure-Python q47 surprisal -> milli-bits -> HDR tercile cutoffs -> bucket
        tok = re.compile(r"[a-z0-9]+")
        toks = {i: tok.findall(t.lower()) for i, t, _ in rows}
        vocab = Counter(t for ts in toks.values() for t in ts)
        total = sum(vocab.values())
        sbits, lang_of = {}, {}
        for i, _, lang in rows:
            ts = toks[i]
            if not ts:
                continue
            avg = _round6(sum(-math.log2(vocab[t] / total) for t in ts) / len(ts))
            sbits[i] = math.floor(avg * 1000)
            lang_of[i] = lang
        buckets = {}
        for lang in set(lang_of.values()):
            vals = [sbits[i] for i in sbits if lang_of[i] == lang]
            c_head, c_mid = _hdr_tercile_cuts(vals)
            for i in sbits:
                if lang_of[i] == lang:
                    v = sbits[i]
                    buckets[i] = "head" if v <= c_head else ("middle" if v <= c_mid else "tail")
        return sbits, buckets

    def test_matches_pure_python_pipeline(self, spark):
        docs = self._docs(spark)
        rows = [(r.doc_id, r.text, r.lang) for r in docs.collect()]
        exp_sbits, exp_buckets = self._expected(rows)
        got = {r.doc_id: r for r in curation.perplexity_buckets(docs).collect()}
        assert sorted(got) == sorted(exp_sbits)
        for i, r in got.items():
            assert r.sbits == exp_sbits[i], f"doc {i}"
            assert r.bucket == exp_buckets[i], f"doc {i}"

    def test_per_language_cutoffs_are_independent(self, spark):
        # same sbits values can land in different buckets per language
        got = curation.perplexity_buckets(self._docs(spark)).collect()
        by_lang = {}
        for r in got:
            by_lang.setdefault(r.lang, []).append(r)
        for lang, rs in by_lang.items():
            names = {r.bucket for r in rs}
            assert names <= {"head", "middle", "tail"}
            # monotone: every head sbits <= every tail sbits within a language
            heads = [r.sbits for r in rs if r.bucket == "head"]
            tails = [r.sbits for r in rs if r.bucket == "tail"]
            if heads and tails:
                assert max(heads) < min(tails)

    def test_partition_invariance(self, spark):
        a = sorted(map(tuple, curation.perplexity_buckets(self._docs(spark, 2)).collect()))
        b = sorted(map(tuple, curation.perplexity_buckets(self._docs(spark, 9)).collect()))
        assert a == b

    def test_cutoff_table_broadcasts(self, spark):
        plan = plan_of(curation.perplexity_buckets(self._docs(spark)))
        assert "BroadcastHashJoin" in plan  # langs x 2 cutoffs, never shuffled


class TestStripHostBoilerplate:
    BANNER = "cookie notice banner"

    def _docs(self, spark, parts=4):
        rows = []
        # host A: 12 docs, banner on all, plus unique body lines
        for i in range(12):
            rows.append((i, "a.gov", [self.BANNER, f"body {i} alpha", f"body {i} beta"]))
        # host B: 5 docs (< min_docs) with the same banner -> must NOT strip
        for i in range(5):
            rows.append((100 + i, "b.gov", [self.BANNER, f"content {i}"]))
        # doc whose every line is boilerplate on host A
        rows.append((50, "a.gov", [self.BANNER]))
        # doc with an empty lines array
        rows.append((60, "a.gov", []))
        df = spark.createDataFrame(rows, ["doc_id", "host", "lines"])
        return df.repartition(parts)

    def _run(self, spark, **kw):
        return {
            r.doc_id: r
            for r in curation.strip_host_boilerplate(
                self._docs(spark), min_docs=10, min_share=0.3, **kw
            ).collect()
        }

    def test_strips_only_flagged_hosts_in_order(self, spark):
        got = self._run(spark)
        # host A body docs: banner removed, body lines kept in order
        for i in range(12):
            r = got[i]
            assert r.clean_text == f"body {i} alpha\nbody {i} beta"
            assert (r.n_lines_kept, r.n_lines_removed) == (2, 1)
        # host B below min_docs: untouched
        for i in range(5):
            r = got[100 + i]
            assert r.clean_text == f"{self.BANNER}\ncontent {i}"
            assert (r.n_lines_kept, r.n_lines_removed) == (2, 0)

    def test_fully_stripped_and_empty_docs_keep_rows(self, spark):
        got = self._run(spark)
        assert got[50].clean_text == ""
        assert (got[50].n_lines_kept, got[50].n_lines_removed) == (0, 1)
        assert got[60].clean_text == ""
        assert (got[60].n_lines_kept, got[60].n_lines_removed) == (0, 0)

    def test_repeated_occurrences_all_strip(self, spark):
        rows = [(i, "c.gov", [self.BANNER, f"x {i}", self.BANNER]) for i in range(10)]
        df = spark.createDataFrame(rows, ["doc_id", "host", "lines"])
        got = {
            r.doc_id: r
            for r in curation.strip_host_boilerplate(df, min_docs=10, min_share=0.3).collect()
        }
        for i in range(10):
            assert got[i].clean_text == f"x {i}"
            assert (got[i].n_lines_kept, got[i].n_lines_removed) == (1, 2)

    def test_blank_lines_never_strip(self, spark):
        rows = [(i, "d.gov", ["", f"y {i}", ""]) for i in range(10)]
        df = spark.createDataFrame(rows, ["doc_id", "host", "lines"])
        got = {
            r.doc_id: r
            for r in curation.strip_host_boilerplate(df, min_docs=10, min_share=0.3).collect()
        }
        for i in range(10):
            assert got[i].clean_text == f"\ny {i}\n"
            assert (got[i].n_lines_kept, got[i].n_lines_removed) == (3, 0)

    def test_no_window_in_plan(self, spark):
        plan = plan_of(curation.strip_host_boilerplate(self._docs(spark)))
        assert "Window" not in plan  # reassembly is a partial-agg'd groupBy

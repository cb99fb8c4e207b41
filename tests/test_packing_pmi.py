"""pack_documents (distributed prefix sum), pmi_pairs, token_quartiles,
corpus_overlap_sketch unit semantics."""

import math

import pytest
from pyspark.sql import functions as F

from searchgov_spider_spark.operators.dedup import corpus_overlap_sketch
from searchgov_spider_spark.operators.packing import pack_documents
from searchgov_spider_spark.operators.textstats import pmi_pairs, token_quartiles


# ---------------------------------------------------------------- packing


def _expected_packing(counts, ctx):
    out, off = {}, 0
    for i, n in enumerate(counts):
        start, end = off, off + n
        bf = start // ctx
        bl = max(end - 1, start) // ctx
        out[i] = (n, start, end, bf, bl, bf != bl)
        off = end
    return out


def test_pack_documents_matches_serial_prefix_sum(spark):
    counts = [(i, (i * 37) % 900 + 10) for i in range(200)]
    df = spark.createDataFrame(counts, "doc_id long, n_tokens long")
    got = {
        r.doc_id: (r.n_tokens, r.start_off, r.end_off, r.bin_first, r.bin_last, r.spans_boundary)
        for r in pack_documents(df, ctx=1024, num_ranges=8).collect()
    }
    assert got == _expected_packing([n for _, n in counts], 1024)


def test_pack_documents_partition_invariant(spark):
    counts = [(i, i % 50 + 1) for i in range(300)]
    a = spark.createDataFrame(counts, "doc_id long, n_tokens long").repartition(13)
    b = spark.createDataFrame(list(reversed(counts)), "doc_id long, n_tokens long").coalesce(1)
    ra = sorted(map(tuple, pack_documents(a, ctx=64, num_ranges=7).collect()))
    rb = sorted(map(tuple, pack_documents(b, ctx=64, num_ranges=3).collect()))
    assert ra == rb


def test_pack_documents_zero_token_doc_is_point(spark):
    df = spark.createDataFrame(
        [(0, 10), (1, 0), (2, 5)], "doc_id long, n_tokens long"
    )
    rows = {r.doc_id: r for r in pack_documents(df, ctx=8).collect()}
    assert rows[1].start_off == rows[1].end_off == 10
    assert rows[1].bin_first == rows[1].bin_last == 1
    assert not rows[1].spans_boundary
    assert rows[0].spans_boundary  # 0..10 crosses the 8-token boundary


def test_pack_documents_no_global_window(spark):
    """The whole point: the plan must range-partition, never sort the
    corpus into a single task (a window with an empty partition spec)."""
    df = spark.createDataFrame([(i, 1) for i in range(10)], "doc_id long, n_tokens long")
    plan = pack_documents(df)._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()
    # every window op in the plan is either partitioned by _pid or runs
    # over the P-row totals (SinglePartition only downstream of the agg)
    assert "Window [sum" not in plan or "_pid" in plan


# ---------------------------------------------------------------- pmi


def test_pmi_pairs_closed_form(spark):
    # 8 docs: 'alpha beta' together in 6, alpha alone in 1, beta alone in 1
    rows = [(i, "alpha beta filler%d" % i) for i in range(6)]
    rows += [(6, "alpha solo"), (7, "beta solo")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {(r.term_a, r.term_b): r for r in pmi_pairs(df, min_support=2, top_n=10).collect()}
    r = out[("alpha", "beta")]
    assert r.n_co == 6
    assert r.pmi == pytest.approx(round(math.log(6 * 8 / (7 * 7)), 6), abs=1e-6)


def test_pmi_pairs_respects_vocab_and_support(spark):
    # 'rare' appears in 2 docs with 'alpha' but vocab_size=2 keeps only
    # the two highest-df terms (alpha, beta)
    rows = [(i, "alpha beta") for i in range(5)] + [(5, "alpha rare"), (6, "alpha rare")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = pmi_pairs(df, vocab_size=2, min_support=2, top_n=10).collect()
    assert {(r.term_a, r.term_b) for r in got} == {("alpha", "beta")}


# ---------------------------------------------------------------- quartiles


def test_token_quartiles_exact_cuts(spark):
    # token counts 1..8, one doc each: quartile boundaries at 2, 4, 6
    rows = [(i, " ".join(["tok"] * i)) for i in range(1, 9)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.quartile for r in token_quartiles(df).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3, 7: 4, 8: 4}


def test_token_quartiles_skewed_histogram(spark):
    # 9 docs of 5 tokens, 1 doc of 100: b25=b50=b75=5 -> the outlier is Q4
    rows = [(i, "a b c d e") for i in range(9)] + [(9, " ".join(["x"] * 100))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.quartile for r in token_quartiles(df).collect()}
    assert all(got[i] == 1 for i in range(9))
    assert got[9] == 4


# ---------------------------------------------------------------- overlap


def test_corpus_overlap_identical_and_disjoint(spark):
    a = spark.createDataFrame([("doc %d" % i,) for i in range(20)], "text string")
    b = spark.createDataFrame([("other %d" % i,) for i in range(20)], "text string")
    same = corpus_overlap_sketch(a, a, k=16).collect()[0]
    assert same.matches == 16 and same.est_jaccard == 1.0 and same.exact_jaccard == 1.0
    disj = corpus_overlap_sketch(a, b, k=16).collect()[0]
    assert disj.matches == 0 and disj.est_jaccard == 0.0
    assert disj.n_inter == 0 and disj.n_union == 40


def test_corpus_overlap_estimates_real_jaccard(spark):
    # 50% overlap by construction: est within a loose sketch tolerance
    a = spark.createDataFrame([("doc %d" % i,) for i in range(100)], "text string")
    b = spark.createDataFrame([("doc %d" % i,) for i in range(50, 150)], "text string")
    r = corpus_overlap_sketch(a, b, k=64).collect()[0]
    assert r.exact_jaccard == pytest.approx(50 / 150, abs=1e-6)
    assert abs(r.est_jaccard - r.exact_jaccard) < 0.2


class TestSpanCorruption:
    def _docs(self, spark, texts):
        return spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")

    def test_reconstruction_invariant_and_rate(self, spark):
        """Splicing each target span back over its sentinel in input_text
        must reproduce the original token stream exactly, for every doc."""
        import re

        from searchgov_spider_spark.operators.packing import (
            SC_BLOCK,
            SC_SPAN,
            span_corruption,
        )

        texts = [
            " ".join(f"tok{i}" for i in range(n)) for n in (1, 5, 19, 20, 21, 60, 237)
        ]
        out = {r.doc_id: r for r in span_corruption(self._docs(spark, texts)).collect()}
        assert len(out) == len(texts)
        for doc_id, r in out.items():
            orig = texts[doc_id].split()
            # parse target into span_idx -> tokens
            spans = {}
            pieces = re.split(r"<extra_id_(\d+)>", r.target_text)
            for k_str, toks in zip(pieces[1::2], pieces[2::2]):
                spans[int(k_str)] = toks.split()
            rebuilt = []
            for tok in r.input_text.split():
                m = re.fullmatch(r"<extra_id_(\d+)>", tok)
                rebuilt.extend(spans[int(m.group(1))] if m else [tok])
            assert rebuilt == orig, f"doc {doc_id} does not reconstruct"
            assert r.n_masked == sum(len(v) for v in spans.values())
            assert r.n_spans == len(spans)
            # every FULL block masks exactly SC_SPAN tokens
            if r.n_tokens >= SC_BLOCK and r.n_tokens % SC_BLOCK == 0:
                assert r.n_masked == r.n_tokens // SC_BLOCK * SC_SPAN

        # corruption rate on long docs ~ SPAN/BLOCK = 15%
        long = out[6]
        assert abs(long.n_masked / long.n_tokens - SC_SPAN / SC_BLOCK) < 0.03

    def test_pure_map_no_exchange(self, spark):
        from searchgov_spider_spark.operators.packing import span_corruption

        df = span_corruption(self._docs(spark, ["a b c"]))
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "BatchEvalPython" not in plan

    def test_partition_invariant(self, spark):
        from searchgov_spider_spark.operators.packing import span_corruption

        texts = [" ".join(f"w{i}x{j}" for j in range(i + 1)) for i in range(40)]
        base = sorted(tuple(r) for r in span_corruption(self._docs(spark, texts)).collect())
        re_run = sorted(
            tuple(r)
            for r in span_corruption(self._docs(spark, texts).repartition(7)).collect()
        )
        assert base == re_run

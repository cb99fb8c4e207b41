"""Unit + plan tests for BPE first-merge pair counts
(operators/textstats.bpe_pair_counts, q77)."""

from searchgov_spider_spark.operators import textstats

from test_plans import plan_of


class TestBpePairCounts:
    def test_hand_counts(self, spark):
        # "aaa" has pairs (a a) twice per occurrence; words are weighted by
        # their corpus frequency; 1-char words contribute nothing
        docs = spark.createDataFrame(
            [(1, "aaa ab x"), (2, "ab aaa")], "doc_id long, text string"
        )
        out = {r.pair: r.n for r in textstats.bpe_pair_counts(docs).collect()}
        assert out["a a"] == 4  # 2 occurrences of "aaa" x 2 in-word pairs
        assert out["a b"] == 2
        assert "x" not in " ".join(out)  # single-char word dropped

    def test_topn_tiebreak(self, spark):
        docs = spark.createDataFrame([(1, "ba dc ba dc zz")], "doc_id long, text string")
        rows = textstats.bpe_pair_counts(docs, top_n=2).collect()
        # counts: "b a"=2, "d c"=2, "z z"=1 -> top-2 by (n desc, pair asc)
        assert [(r.pair, r.n) for r in rows] == [("b a", 2), ("d c", 2)]

    def test_vocab_collapse_and_topk_plan(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        plan = plan_of(textstats.bpe_pair_counts(docs), "simple")
        # top-n must be TakeOrderedAndProject (per-partition heaps), never a
        # global Sort; both groupBys partial-agg'd; no Python stages
        assert "TakeOrderedAndProject" in plan
        assert "partial" in plan.lower()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

"""Unit tests for incremental cross-corpus near-dedup
(operators/dedup.lsh_novelty, q76)."""

from searchgov_spider_spark.operators import dedup

from test_plans import plan_of


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


LONG_A = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(20))
LONG_B = " ".join(f"delta{i} epsilon{i} zeta{i}" for i in range(20))


class TestLshNovelty:
    def test_copy_flagged_novel_doc_kept(self, spark):
        corpus = _df(spark, [(1, LONG_A), (2, LONG_B)])
        batch = _df(spark, [(10, LONG_A), (11, "entirely different words here")])
        out = {r.doc_id: r for r in dedup.lsh_novelty(batch, corpus).collect()}
        assert out[10].is_novel is False
        assert out[10].matched_id == 1 and out[10].jaccard == 1.0
        assert out[11].is_novel is True
        assert out[11].matched_id is None and out[11].jaccard is None

    def test_lowest_id_match_wins(self, spark):
        # corpus contains the same text twice: the reported match must be
        # the lower corpus id, deterministically
        corpus = _df(spark, [(5, LONG_A), (3, LONG_A)])
        batch = _df(spark, [(10, LONG_A)])
        row = dedup.lsh_novelty(batch, corpus).collect()[0]
        assert row.is_novel is False and row.matched_id == 3

    def test_batch_never_self_joins(self, spark):
        # two identical docs INSIDE the batch stay novel when the corpus
        # has no match — incremental dedup is strictly batch-vs-corpus
        corpus = _df(spark, [(1, LONG_B)])
        batch = _df(spark, [(10, LONG_A), (11, LONG_A)])
        out = {r.doc_id: r for r in dedup.lsh_novelty(batch, corpus).collect()}
        assert out[10].is_novel is True and out[11].is_novel is True

    def test_plan_no_cartesian_no_python(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
        batch = docs.limit(50)
        plan = plan_of(dedup.lsh_novelty(batch, docs), "simple")
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

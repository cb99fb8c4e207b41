"""Unit + plan tests for anchor-text aggregation
(operators/graph.anchor_topk_terms, q78)."""

from searchgov_spider_spark.operators import graph

from test_plans import plan_of


class TestAnchorTerms:
    def test_hand_case(self, spark):
        edges = spark.createDataFrame(
            [
                (1, 9, "tax forms online"),
                (2, 9, "tax help"),
                (3, 9, "irs tax"),
                (4, 8, "contact page"),
            ],
            "src long, dst long, anchor string",
        )
        out = graph.anchor_topk_terms(edges, k=2).collect()
        by_dst = {}
        for r in out:
            by_dst.setdefault(r.dst, []).append((r.rank, r.term, r.n))
        # dst 9: "tax" appears in 3 anchors; tie between the rest broken asc
        assert sorted(by_dst[9]) == [(1, "tax", 3), (2, "forms", 1)]
        assert sorted(by_dst[8]) == [(1, "contact", 1), (2, "page", 1)]

    def test_window_is_partitioned_by_target(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "text"
        )
        edges = docs.selectExpr(
            "doc_id AS src", "(doc_id * 7 + 1) % 500 AS dst", "substring(text, 1, 40) AS anchor"
        )
        plan = plan_of(graph.anchor_topk_terms(edges), "simple")
        # the rank window must shuffle on dst, never collapse to a single
        # partition; aggregation partial; no Python stages
        assert "SinglePartition" not in plan
        assert "partial" in plan.lower()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

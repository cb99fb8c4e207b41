"""Unit tests for HITS hub/authority scores (operators/graph.hits, q75)."""

from searchgov_spider_spark.operators import graph

from test_plans import plan_of


class TestHits:
    def test_hand_case(self, spark):
        # 1 -> 3, 2 -> 3, 3 -> 4, node 5 isolated.  Five L1-normalized
        # iterations by hand: auth(3) = 32/33, auth(4) = 1/33,
        # hub(1) = hub(2) = 32/65, hub(3) = 1/65.
        edges = spark.createDataFrame(
            [(1, 3), (2, 3), (3, 4)], "src long, dst long"
        )
        nodes = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
        out = {r.id: r for r in graph.hits(edges, nodes, n_iter=5).collect()}
        assert len(out) == 5
        assert out[3].authority == round(32 / 33, 6)
        assert out[4].authority == round(1 / 33, 6)
        assert out[1].authority == 0.0 and out[2].authority == 0.0
        assert out[1].hub == round(32 / 65, 6) and out[2].hub == round(32 / 65, 6)
        assert out[3].hub == round(1 / 65, 6)
        assert out[4].hub == 0.0
        assert out[5].authority == 0.0 and out[5].hub == 0.0

    def test_l1_normalized_each_side(self, spark):
        edges = spark.createDataFrame(
            [(1, 2), (2, 1), (1, 3)], "src long, dst long"
        )
        nodes = spark.createDataFrame([(1,), (2,), (3,)], "id long")
        rows = graph.hits(edges, nodes, n_iter=3).collect()
        assert abs(sum(r.authority for r in rows) - 1.0) < 1e-4
        assert abs(sum(r.hub for r in rows) - 1.0) < 1e-4

    def test_plan_depth_is_cut_per_iteration(self, spark):
        # each iteration localCheckpoints, so the FINAL plan is a join of
        # two checkpointed scans — O(1) depth regardless of n_iter (the
        # same lineage-cut discipline as connected_components/pagerank)
        edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
        nodes = spark.createDataFrame([(1,), (2,), (3,)], "id long")
        plan = plan_of(graph.hits(edges, nodes, n_iter=4), "simple")
        assert "ExistingRDD" in plan
        assert "CartesianProduct" not in plan
        # no groupBy survives into the final plan: the iterations already ran
        assert "HashAggregate" not in plan

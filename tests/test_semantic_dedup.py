"""Unit + plan tests for SemDeDup (q74): k-means cells + within-cell
cosine pruning (operators/similarity.semantic_dedup)."""

import numpy as np
from pyspark.sql import functions as F

from searchgov_spider_spark.operators import similarity

from test_plans import plan_of


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestSemanticDedup:
    def test_hand_case_with_explicit_centroids(self, spark):
        # two well-separated cells; centroid 0 at +e0, centroid 1 at +e1
        cents = np.array([[10.0, 0.0], [0.0, 10.0]], dtype=np.float64)
        rows = [
            (1, [9.0, 0.1]),     # cell 0
            (2, [9.0, 0.1]),     # exact dup of 1 -> dropped
            (3, [0.1, 9.0]),     # cell 1, unique
            (4, [9.0, 0.1]),     # cell 1? no: nearest +e0 -> cell 0, dup of 1
            (5, [-0.1, 8.0]),    # cell 1, cosine vs 3 ~= 0.986 -> dropped
        ]
        out = {
            r.vec_id: r
            for r in similarity.semantic_dedup(
                _emb(spark, rows), dim=2, threshold=0.95, centroids=cents
            ).collect()
        }
        assert out[1].keep is True and out[1].cell == 0
        assert out[2].keep is False and out[2].cell == 0
        assert out[3].keep is True and out[3].cell == 1
        assert out[4].keep is False and out[4].cell == 0
        assert out[5].keep is False and out[5].cell == 1
        # lowest id per duplicate set is the survivor, all rows present
        assert len(out) == 5

    def test_cross_cell_dup_not_dropped(self, spark):
        # identical direction but assigned to different cells (euclidean
        # quantizer, different magnitudes) -> SemDeDup by contract only
        # prunes within a cell
        cents = np.array([[1.0, 0.0], [100.0, 0.0]], dtype=np.float64)
        rows = [(1, [2.0, 0.0]), (2, [99.0, 0.0])]
        out = {
            r.vec_id: r
            for r in similarity.semantic_dedup(
                _emb(spark, rows), dim=2, threshold=0.95, centroids=cents
            ).collect()
        }
        assert out[1].cell != out[2].cell
        assert out[1].keep is True and out[2].keep is True

    def test_pairwise_stage_is_cell_equi_join(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
        df = similarity.semantic_dedup(emb, dim=64, n_cells=8)
        plan = plan_of(df, "simple")
        # the Σ|cell|² pairwise stage must be an equi-join on the cell key,
        # never a cartesian/nested-loop explosion
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # the whole operator is JVM-side: cell assignment is a codegen'd
        # expression (ivf_cell_expr), the cosine a fold — zero Python stages
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan

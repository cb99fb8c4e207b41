"""HyperLogLog sketch operator: accuracy on both correction branches,
register mergeability, partition/duplicate invariance."""

import pytest
from pyspark.sql import functions as F

from searchgov_spider_spark.operators import sketches


def _keyed(spark, n_distinct, copies=3, grp="g"):
    return (
        spark.range(n_distinct * copies)
        .select(
            F.lit(grp).alias("grp"),
            F.concat(F.lit("k"), (F.col("id") % n_distinct).cast("string")).alias("k"),
        )
    )


class TestHllDistinct:
    def test_raw_branch_accuracy(self, spark):
        # 5000 distinct >> 2.5*m = 640 -> harmonic-mean branch; the standard
        # error for m=256 is 1.04/16 = 6.5%, so 20% is a safe deterministic bound
        row = sketches.hll_distinct(_keyed(spark, 5000), "k", ["grp"]).collect()[0]
        assert row.v_zero == 0 or row.est_distinct > 2.5 * 256
        assert abs(row.est_distinct - 5000) / 5000 < 0.20

    def test_linear_counting_small_range(self, spark):
        # 100 distinct << m: linear counting is near-exact
        row = sketches.hll_distinct(_keyed(spark, 100), "k", ["grp"]).collect()[0]
        assert row.v_zero > 0
        assert abs(row.est_distinct - 100) / 100 < 0.10

    def test_duplicates_do_not_move_the_estimate(self, spark):
        df = _keyed(spark, 800, copies=1)
        one = sketches.hll_distinct(df, "k", ["grp"]).collect()[0]
        ten = sketches.hll_distinct(df.unionAll(df).unionAll(df), "k", ["grp"]).collect()[0]
        assert one.est_distinct == ten.est_distinct

    def test_partition_invariance(self, spark):
        df = _keyed(spark, 1200)
        a = sketches.hll_distinct(df, "k", ["grp"]).collect()[0]
        b = sketches.hll_distinct(df.repartition(13), "k", ["grp"]).collect()[0]
        assert a.est_distinct == b.est_distinct

    def test_union_merges_by_register_max(self, spark):
        # sketch(A u B) must equal register-wise max of sketch(A), sketch(B):
        # the property that makes per-day sketches combinable without rescan
        a = _keyed(spark, 700, copies=1)
        b = (
            spark.range(900)
            .select(F.lit("g").alias("grp"), F.concat(F.lit("j"), F.col("id").cast("string")).alias("k"))
        )
        whole = sketches.hll_registers(a.unionAll(b), "k", ["grp"])
        merged = (
            sketches.hll_registers(a, "k", ["grp"])
            .unionAll(sketches.hll_registers(b, "k", ["grp"]))
            .groupBy("grp", "bucket")
            .agg(F.max("rho").alias("rho"))
        )
        assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))

    def test_exact_columns(self, spark):
        row = sketches.hll_distinct(
            _keyed(spark, 300), "k", ["grp"], include_exact=True
        ).collect()[0]
        assert row.exact_distinct == 300
        assert row.rel_err == pytest.approx(abs(row.est_distinct - 300) / 300, abs=1e-4)

    def test_register_shuffle_is_partial_aggregated(self, spark):
        # the (group, bucket) agg must show partial aggregation (two
        # HashAggregate nodes) so map output is <= m rows per partition
        plan = sketches.hll_registers(
            _keyed(spark, 2000), "k", ["grp"]
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("HashAggregate") >= 2

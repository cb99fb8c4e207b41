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


class TestCountMin:
    def _stream(self, spark):
        # token 't<i>' appears (50 - i) times for i in 0..49: known skew
        return (
            spark.range(50)
            .select(
                F.col("id"),
                F.explode(F.expr("sequence(1, cast(50 - id as int))")).alias("j"),
            )
            .select(F.concat(F.lit("t"), F.col("id").cast("string")).alias("k"))
        )

    def test_never_underestimates(self, spark):
        from searchgov_spider_spark.operators.sketches import cm_estimate, cm_sketch

        st = self._stream(spark)
        sk = cm_sketch(st, "k")
        probes = st.groupBy("k").agg(F.count("*").alias("exact"))
        rows = cm_estimate(sk, probes.select("k"), "k").join(probes, "k").collect()
        assert len(rows) == 50
        assert all(r.cm_est >= r.exact for r in rows)
        # w=1024 >> 50 distinct keys: collisions are rare, most are exact
        assert sum(1 for r in rows if r.cm_est == r.exact) >= 45

    def test_sketch_is_bounded_and_merges_by_sum(self, spark):
        from searchgov_spider_spark.operators.sketches import CM_D, CM_W, cm_sketch

        a = self._stream(spark)
        b = a.limit(300)
        whole = cm_sketch(a.unionAll(b), "k")
        assert whole.count() <= CM_D * CM_W
        merged = (
            cm_sketch(a, "k")
            .unionAll(cm_sketch(b, "k"))
            .groupBy("hrow", "bucket")
            .agg(F.sum("cnt").alias("cnt"))
        )
        assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))

    def test_probe_join_broadcasts_the_sketch(self, spark):
        from searchgov_spider_spark.operators.sketches import cm_estimate, cm_sketch

        st = self._stream(spark)
        plan = (
            cm_estimate(cm_sketch(st, "k"), st.select("k").distinct(), "k")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan


class TestHdrQuantiles:
    def _vals(self, spark):
        # 1..1000 in one group: exact quantiles are 500/900/990
        return spark.range(1, 1001).select(
            F.lit("g").alias("grp"), F.col("id").alias("v")
        )

    def test_matches_pure_python_hdr(self, spark):
        from searchgov_spider_spark.operators.sketches import HDR_SUB, hdr_quantiles

        rows = hdr_quantiles(self._vals(spark), "v", ["grp"], include_exact=True).collect()
        got = {r.qlabel: r for r in rows}
        # independent re-derivation with pure Python ints
        import math

        def idx_of(v):
            o = v.bit_length() - 1
            return o * HDR_SUB + ((v * HDR_SUB) >> o) - HDR_SUB

        from collections import Counter

        hist = Counter(idx_of(v) for v in range(1, 1001))
        for lbl, num, den in (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)):
            target = (num * 1000 + den - 1) // den
            cum = 0
            for idx in sorted(hist):
                cum += hist[idx]
                if cum >= target:
                    break
            mid = round((33 + 2 * (idx % HDR_SUB)) * math.pow(2.0, idx // HDR_SUB - 5), 4)
            assert got[lbl].est_value == mid
            assert got[lbl].exact_value == target  # values ARE 1..1000
            assert got[lbl].n == 1000

    def test_relative_error_bound(self, spark):
        from searchgov_spider_spark.operators.sketches import hdr_quantiles

        rows = hdr_quantiles(self._vals(spark), "v", ["grp"], include_exact=True).collect()
        # bucket width is 1/16 of the octave: midpoint is within ~6.25%
        assert all(r.rel_err <= 0.0625 for r in rows)

    def test_histogram_merges_by_count_sum(self, spark):
        from searchgov_spider_spark.operators.sketches import hdr_histogram

        a = self._vals(spark)
        b = a.filter(F.col("v") % 3 == 0)
        whole = hdr_histogram(a.unionAll(b), "v", ["grp"])
        merged = (
            hdr_histogram(a, "v", ["grp"])
            .unionAll(hdr_histogram(b, "v", ["grp"]))
            .groupBy("grp", "idx")
            .agg(F.sum("cnt").alias("cnt"))
        )
        assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))

    def test_zero_values_land_in_unit_bucket(self, spark):
        from searchgov_spider_spark.operators.sketches import hdr_quantiles

        d = spark.range(10).select(F.lit("g").alias("grp"), F.lit(0).alias("v"))
        rows = hdr_quantiles(d, "v", ["grp"], include_exact=True).collect()
        assert all(r.exact_value == 1 for r in rows)


class TestKmv:
    def _pure_kmv(self, keys, k=256):
        import hashlib

        hs = sorted({hashlib.md5(str(x).encode()).hexdigest() for x in keys})
        return hs[:k]

    def test_sketch_matches_pure_python(self, spark):
        keys = [f"k{i}" for i in range(3000)]
        df = spark.createDataFrame([(x,) for x in keys], ["k"]).withColumn(
            "grp", F.lit("g")
        )
        got = [
            r["kmv_hash"]
            for r in sketches.kmv_min_hashes(df, "k", ["grp"], k=256)
            .orderBy("kmv_rank")
            .collect()
        ]
        assert got == self._pure_kmv(keys)

    def test_guard_makes_result_exact_under_bad_prefilter(self, spark):
        # safety so small the prefilter keeps ~0 rows -> every group must
        # take the guard path and the result still be the true top-k
        keys = [f"k{i}" for i in range(2000)]
        df = spark.createDataFrame([(x,) for x in keys], ["k"]).withColumn(
            "grp", F.lit("g")
        )
        got = [
            r["kmv_hash"]
            for r in sketches.kmv_min_hashes(df, "k", ["grp"], k=64, safety=0.001)
            .orderBy("kmv_rank")
            .collect()
        ]
        assert got == self._pure_kmv(keys, k=64)

    def test_estimate_accuracy(self, spark):
        # KMV standard error ~ 1/sqrt(k-2) = 6.3% at k=256; 20% is a safe
        # deterministic bound for one fixed hash draw
        df = spark.createDataFrame(
            [(f"k{i}",) for i in range(10000)], ["k"]
        ).withColumn("grp", F.lit("g"))
        sk = sketches.kmv_min_hashes(df, "k", ["grp"], k=256)
        est = sketches._kmv_estimate(sk, ["grp"], 256).collect()[0]
        assert est["sketch_size"] == 256
        assert abs(est["distinct_est"] - 10000) / 10000 < 0.20

    def test_small_stream_exact(self, spark):
        df = spark.createDataFrame([(f"k{i}",) for i in range(50)], ["k"]).withColumn(
            "grp", F.lit("g")
        )
        est = sketches._kmv_estimate(
            sketches.kmv_min_hashes(df, "k", ["grp"], k=256), ["grp"], 256
        ).collect()[0]
        assert est["sketch_size"] == 50
        assert est["distinct_est"] == 50.0

    def test_set_ops_against_truth(self, spark):
        # A = 0..5999, B = 4000..9999 -> |A|=6000 |B|=6000 |AuB|=10000
        # J = 2000/10000 = 0.2
        rows = [("a", f"k{i}") for i in range(6000)]
        rows += [("b", f"k{i}") for i in range(4000, 10000)]
        df = spark.createDataFrame(rows, ["corpus", "k"])
        r = sketches.kmv_set_ops(df, "corpus", "k", "a", "b", k=256).collect()[0]
        assert abs(r["distinct_a_est"] - 6000) / 6000 < 0.20
        assert abs(r["union_est"] - 10000) / 10000 < 0.20
        assert abs(r["jaccard_est"] - 0.2) < 0.1
        assert abs(r["intersection_est"] - 2000) / 2000 < 0.5

    def test_partition_invariance(self, spark):
        rows = [("a", f"k{i}") for i in range(3000)]
        rows += [("b", f"k{i}") for i in range(1000, 4000)]
        a = spark.createDataFrame(rows, ["corpus", "k"]).repartition(1)
        b = spark.createDataFrame(rows, ["corpus", "k"]).repartition(32)
        ra = sketches.kmv_set_ops(a, "corpus", "k", "a", "b", k=128).collect()[0]
        rb = sketches.kmv_set_ops(b, "corpus", "k", "a", "b", k=128).collect()[0]
        assert ra == rb

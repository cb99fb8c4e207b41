"""Unit + plan tests for the interval operators and RRF fusion (q67-q69).

Semantics on tiny literal inputs, plus the physical-plan pins the 100-TB
story depends on: the point-in-interval join must be an equi-join on the
bin (never a nested-loop theta-join), and the global running sum must
never collapse to a single-partition window."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from searchgov_spider_spark.operators import intervals, retrieval

from test_plans import plan_of


def _iv(spark, rows):
    return spark.createDataFrame(rows, "iv_id long, start_us long, end_us long")


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pt_id long, ev_us long")


# ---------------------------------------------------------------------------
# point_in_interval_join
# ---------------------------------------------------------------------------


class TestPointInIntervalJoin:
    def test_inclusive_bounds_and_multi_bin(self, spark):
        # bin_width=10: interval [5, 27] covers bins 0,1,2; [30, 30] is a point
        iv = _iv(spark, [(1, 5, 27), (2, 30, 30)])
        pts = _pts(spark, [(10, 5), (11, 27), (12, 28), (13, 30), (14, 4)])
        out = intervals.point_in_interval_join(
            pts, iv, "ev_us", "start_us", "end_us", bin_width=10
        )
        got = sorted((r.pt_id, r.iv_id) for r in out.collect())
        # 5 and 27 inclusive; 28 outside; 30 hits the point interval; 4 nothing
        assert got == [(10, 1), (11, 1), (13, 2)]

    def test_no_duplicate_pairs_from_bin_explosion(self, spark):
        # the same (point, interval) pair can only meet in the point's ONE bin
        iv = _iv(spark, [(1, 0, 95)])  # covers 10 bins
        pts = _pts(spark, [(i, i * 7) for i in range(14)])
        out = intervals.point_in_interval_join(
            pts, iv, "ev_us", "start_us", "end_us", bin_width=10
        ).collect()
        inside = [r for r in out if r.ev_us <= 95]
        assert len(out) == len(inside) == 14
        assert len({(r.pt_id, r.iv_id) for r in out}) == 14

    def test_ambiguous_columns_rejected(self, spark):
        iv = _iv(spark, [(1, 0, 9)]).withColumnRenamed("iv_id", "pt_id")
        with pytest.raises(ValueError, match="ambiguous"):
            intervals.point_in_interval_join(
                _pts(spark, [(1, 0)]), iv, "ev_us", "start_us", "end_us", 10
            )
        with pytest.raises(ValueError, match="bin_width"):
            intervals.point_in_interval_join(
                _pts(spark, [(1, 0)]), _iv(spark, [(1, 0, 9)]),
                "ev_us", "start_us", "end_us", 0,
            )

    def test_plan_is_equi_join_never_nested_loop(self, spark, sf_dir):
        from searchgov_spider_spark.operators import sessions

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        sess = sessions.sessionize(ev, 30).select(
            F.col("user_id").alias("s_user"), "session_idx", "start_us", "end_us"
        )
        pts = ev.select(
            "event_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("ev_us")
        )
        plan = plan_of(
            intervals.point_in_interval_join(
                pts, sess, "ev_us", "start_us", "end_us", 3_600_000_000
            ),
            "simple",
        )
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan
        # the containment predicate must NOT be the join condition; the bin is
        assert "_bin" in plan


# ---------------------------------------------------------------------------
# running_sum_global / concurrency_timeline
# ---------------------------------------------------------------------------


class TestRunningSum:
    def test_matches_single_window_across_partitions(self, spark):
        rows = [(i, ((i * 37) % 11) - 5) for i in range(500)]
        df = spark.createDataFrame(rows, "ts long, d long").repartition(7)
        out = intervals.running_sum_global(df, ["ts"], "d", num_partitions=5)
        got = {r.ts: r.running for r in out.collect()}
        run, want = 0, {}
        for ts, d in sorted(rows):
            run += d
            want[ts] = run
        assert got == want

    def test_no_single_partition_exchange(self, spark):
        df = spark.createDataFrame([(i, 1) for i in range(100)], "ts long, d long")
        out = intervals.running_sum_global(df, ["ts"], "d", num_partitions=4)
        plan = plan_of(out, "simple")
        assert "SinglePartition" not in plan

    def test_concurrency_timeline_hand_case(self, spark):
        # [0,10] and [5,20] overlap on [5,10]; [21,30] is back-to-back after
        # [5,20] (21 = 20+1: the -1 and +1 deltas merge BEFORE the running
        # sum, so t=21 shows no dip — a net-zero change point stays in the
        # output, value unchanged); [40,40] is isolated
        iv = _iv(spark, [(1, 0, 10), (2, 5, 20), (3, 21, 30), (4, 40, 40)])
        got = [(r.ts_us, r.active) for r in
               intervals.concurrency_timeline(iv).orderBy("ts_us").collect()]
        assert got == [(0, 1), (5, 2), (11, 1), (21, 1), (31, 0), (40, 1), (41, 0)]

    def test_timeline_ends_at_zero_and_peaks(self, spark):
        iv = _iv(spark, [(i, 10 * i, 10 * i + 25) for i in range(20)])
        rows = intervals.concurrency_timeline(iv).orderBy("ts_us").collect()
        assert rows[-1].active == 0
        assert max(r.active for r in rows) == 3  # spans 25 at stride 10


# ---------------------------------------------------------------------------
# rrf_fuse
# ---------------------------------------------------------------------------


class TestRrfFuse:
    def _ranked(self, spark, pairs):
        return spark.createDataFrame(pairs, "doc_id long, rank long")

    def test_formula_and_missing_ranker(self, spark):
        a = self._ranked(spark, [(1, 1), (2, 2)])
        b = self._ranked(spark, [(2, 1), (3, 2)])
        out = {r.doc_id: r for r in
               retrieval.rrf_fuse({"a": a, "b": b}, k=60, top_n=10).collect()}
        assert out[2].rrf == round(1 / 62 + 1 / 61, 6)  # in both lists
        assert out[1].rrf == round(1 / 61, 6) and out[1].b_rank is None
        assert out[3].rrf == round(1 / 62, 6) and out[3].a_rank is None
        # doc 2 (two hits) outranks both single-hit docs
        assert max(out, key=lambda d: out[d].rrf) == 2

    def test_top_n_cut_breaks_ties_by_id(self, spark):
        a = self._ranked(spark, [(5, 1), (3, 1), (9, 2)])
        out = retrieval.rrf_fuse({"a": a}, k=60, top_n=2).collect()
        assert [r.doc_id for r in out] == [3, 5]  # equal rrf -> id asc

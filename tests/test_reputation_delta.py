"""Unit + plan tests for source reputation (q70) and snapshot delta (q71)."""

from pyspark.sql import functions as F

from searchgov_spider_spark.operators import curation, snapshots

from test_plans import plan_of


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


class TestSourceReputation:
    def test_signals_hand_case(self, spark):
        long = " ".join(f"w{i}" for i in range(60))
        rows = [
            # spammy.example: 4 docs, 2 exact dups, 2 short
            (1, long, "spammy.example"),
            (2, long, "spammy.example"),
            (3, "tiny", "spammy.example"),
            (4, "also tiny", "spammy.example"),
            # clean.example: 3 distinct long docs
            (5, long + " a", "clean.example"),
            (6, long + " b", "clean.example"),
            (7, long + " c", "clean.example"),
            # lone.example: good doc but below min_docs
            (8, long + " d", "lone.example"),
        ]
        out = {r.source: r for r in curation.source_reputation(_docs(spark, rows)).collect()}
        sp = out["spammy.example"]
        assert sp.n_docs == 4 and sp.dup_rate == 0.25 and sp.short_rate == 0.5
        assert sp.score == round(0.75 * 0.5, 6) and sp.keep is False
        cl = out["clean.example"]
        assert cl.dup_rate == 0.0 and cl.short_rate == 0.0 and cl.score == 1.0
        assert cl.keep is True
        assert out["lone.example"].score == 1.0 and out["lone.example"].keep is False

    def test_one_partial_agg_shuffle(self, spark, sf_dir):
        df = curation.source_reputation(spark.read.parquet(f"{sf_dir}/documents.parquet"))
        plan = plan_of(df, "simple")
        # count_distinct over the digest expands to a two-level aggregate:
        # (source) and (source, hash) keys — both uniform, both partial-agg'd;
        # no Python stages anywhere
        assert plan.count("Exchange") <= 2
        assert "partial" in plan.lower()
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestSnapshotDelta:
    def test_statuses_and_unchanged_dropped(self, spark):
        old = spark.createDataFrame(
            [(1, "same"), (2, "will change"), (3, "goes away")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(1, "same"), (2, "changed!"), (4, "brand new")],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in snapshots.snapshot_delta(old, new).collect()}
        assert set(out) == {2, 3, 4}  # doc 1 unchanged -> dropped
        assert out[2].status == "changed" and out[2].old_hash != out[2].new_hash
        assert out[3].status == "removed" and out[3].new_hash is None
        assert out[4].status == "added" and out[4].old_hash is None

    def test_summary_counts(self, spark):
        old = spark.createDataFrame([(i, f"t{i}") for i in range(10)], "doc_id long, text string")
        new = spark.createDataFrame(
            [(i, f"t{i}" if i % 2 else f"t{i}x") for i in range(2, 12)],
            "doc_id long, text string",
        )
        got = {r.status: r.n for r in
               snapshots.delta_summary(snapshots.snapshot_delta(old, new)).collect()}
        # 0,1 removed; 10,11 added; evens 2..10 present-in-both changed (2,4,6,8)
        assert got == {"removed": 2, "added": 2, "changed": 4}

    def test_text_never_rides_the_join(self, spark, sf_dir):
        d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
        import re

        plan = plan_of(snapshots.snapshot_delta(d, d), "formatted")
        # the md5 projection happens below the shuffle: every Exchange node's
        # Input schema is (doc_id, 32-char digest) — the wide text column must
        # not appear in any exchange's detail block
        blocks = re.split(r"\n(?=\(\d+\) )", plan)
        ex_blocks = [b for b in blocks if re.match(r"\(\d+\) Exchange", b)]
        assert ex_blocks, "expected at least one Exchange in the diff plan"
        for b in ex_blocks:
            assert "text#" not in b
        assert "md5" in plan


class TestContainment:
    def test_excerpt_fully_contained_jaccard_small(self, spark):
        from searchgov_spider_spark.operators import dedup

        body = " ".join(f"w{i}" for i in range(100))
        excerpt = " ".join(f"w{i}" for i in range(10))  # prefix excerpt
        docs = spark.createDataFrame(
            [(1, body), (2, excerpt)], "doc_id long, text string"
        )
        pairs = spark.createDataFrame([(2, 1)], "id_a long, id_b long")
        r = dedup.ngram_containment_pairs(docs, pairs).collect()[0]
        # every shingle of the excerpt appears in the body
        assert r.containment_a_in_b == 1.0
        # 8 excerpt shingles / 98 body shingles
        assert r.containment_b_in_a == round(8 / 98, 6)
        assert r.jaccard == round(8 / 98, 6)  # union == body's shingles

    def test_disjoint_and_identical(self, spark):
        from searchgov_spider_spark.operators import dedup

        docs = spark.createDataFrame(
            [(1, "a b c d e"), (2, "x y z q r"), (3, "a b c d e")],
            "doc_id long, text string",
        )
        pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
        out = {(r.id_a, r.id_b): r for r in
               dedup.ngram_containment_pairs(docs, pairs).collect()}
        assert out[(1, 2)].containment_a_in_b == 0.0 and out[(1, 2)].jaccard == 0.0
        assert out[(1, 3)].containment_a_in_b == 1.0
        assert out[(1, 3)].containment_b_in_a == 1.0 and out[(1, 3)].jaccard == 1.0


class TestSessionWindowBuiltin:
    def test_builtin_matches_composed_sessionize(self, spark):
        # same event log through Spark's built-in session_window and the
        # window/lag composition must yield identical sessions
        import datetime as dt

        from searchgov_spider_spark.operators import sessions

        base = dt.datetime(2024, 1, 1)
        rows = []
        for u in range(5):
            t = base + dt.timedelta(minutes=u)
            for i in range(20):
                # gaps alternate 5 min (continue) and 31 min (break) per user
                t = t + dt.timedelta(minutes=5 if i % 3 else 31)
                rows.append((u * 100 + i, t, u, 1.0))
        ev = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, value double"
        )
        composed = {
            (r.user_id, r.start_us): (r.end_us, r.n_events)
            for r in sessions.sessionize(ev, 30).collect()
        }
        from pyspark.sql import functions as F

        built = (
            ev.groupBy("user_id", F.session_window(F.col("ts"), "30 minutes").alias("w"))
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.unix_micros("w.start").alias("start_us"),
                F.unix_micros("w.end").alias("end_us"),
                "n_events",
            )
            .collect()
        )
        assert len(built) == len(composed)
        gap_us = 30 * 60 * 1_000_000
        for r in built:
            end_us, n = composed[(r.user_id, r.start_us)]
            assert r.n_events == n
            # built-in end = last event + gap; composed end = last event
            assert r.end_us == end_us + gap_us

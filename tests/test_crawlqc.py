"""Crawl quality-control operators (operators/crawlqc): soft-404 flags,
mirror-host detection, crawl-trap scoring, AIMD adaptive politeness, script
profiling, and the composite quality ensemble.

Each operator is checked against hand-computed expectations on constructed
inputs (the q112-q117 oracles cover the sf-corpus parity), plus plan audits
pinning the scale story — zero shuffles for the pure scans, broadcast for the
totals join, a single host shuffle for the politeness window."""

import io
import math
from contextlib import redirect_stdout
from datetime import datetime

from pyspark.sql import functions as F

from searchgov_spider_spark.operators import crawlqc


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


class TestSoft404:
    def test_flags(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "404 - Page Not Found. The requested URL does not exist."),
                (2, "a long article " + "word " * 100 + "that mentions 404 once"),
                (3, "perfectly ordinary page about agriculture"),
                (4, "An error occurred"),
            ],
            ["doc_id", "text"],
        )
        got = {
            r["doc_id"]: (r["n_hits"], r["is_soft404"])
            for r in crawlqc.soft404_flags(docs).collect()
        }
        # doc 1: '404' + 'page not found' + 'does not exist' = 3 hits, short
        assert got[1] == (3, True)
        # doc 2: hits but fails the length gate
        assert got[2][0] >= 1 and got[2][1] is False
        assert got[3] == (0, False)
        assert got[4] == (1, True)

    def test_zero_shuffle_scan(self, spark):
        docs = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
        assert "Exchange" not in plan_of(crawlqc.soft404_flags(docs))


class TestMirrorHosts:
    def test_pairs_and_containment(self, spark):
        # b mirrors 3 of a's 4 pages (containment 3/3=1.0 vs b's total 3);
        # c shares only 1 page with a -> below min_shared
        rows = [("a", f"p{i}") for i in range(4)]
        rows += [("b", f"p{i}") for i in range(3)]
        rows += [("c", "p0"), ("c", "q1"), ("c", "q2")]
        docs = spark.createDataFrame(rows, ["host", "text"])
        got = crawlqc.mirror_host_pairs(docs, min_shared=3, min_containment=0.5).collect()
        assert len(got) == 1
        r = got[0]
        assert (r["host_a"], r["host_b"], r["shared_docs"]) == ("a", "b", 3)
        assert r["containment"] == 1.0

    def test_duplicate_urls_within_host_count_once(self, spark):
        # the same content fetched twice on one host must not inflate shared
        docs = spark.createDataFrame(
            [("a", "p0"), ("a", "p0"), ("b", "p0"), ("b", "p1"), ("a", "p1"), ("a", "p2")],
            ["host", "text"],
        )
        got = crawlqc.mirror_host_pairs(docs, min_shared=2, min_containment=0.5).collect()
        assert len(got) == 1
        assert got[0]["shared_docs"] == 2

    def test_totals_join_broadcasts(self, spark):
        docs = spark.createDataFrame([("a", "p0"), ("b", "p0")], ["host", "text"])
        assert "BroadcastHashJoin" in plan_of(
            crawlqc.mirror_host_pairs(docs, min_shared=1, min_containment=0.1)
        )


class TestCrawlTraps:
    def test_scores(self, spark):
        rows = [("trap", "same") for _ in range(30)] + [
            ("clean", f"p{i}") for i in range(25)
        ]
        docs = spark.createDataFrame(rows, ["host", "text"])
        got = {r["host"]: r for r in crawlqc.crawl_trap_scores(docs).collect()}
        assert got["trap"]["n_distinct"] == 1
        assert got["trap"]["trap_score"] == round(1 - 1 / 30, 6)
        assert got["trap"]["is_trap"] is True
        assert got["clean"]["trap_score"] == 0.0
        assert got["clean"]["is_trap"] is False

    def test_small_host_never_flags(self, spark):
        docs = spark.createDataFrame([("tiny", "same")] * 5, ["host", "text"])
        assert crawlqc.crawl_trap_scores(docs).collect()[0]["is_trap"] is False


class TestAdaptivePoliteness:
    @staticmethod
    def _reference(events, base=1000, step=100, lo=100, hi=8000, w=20, cap=3):
        """Pure-Python sequential AIMD via the same closed form."""
        out = {}
        by_host = {}
        for host, ts, eid, err in sorted(events, key=lambda e: (e[0], e[1], e[2])):
            by_host.setdefault(host, []).append(err)
        for host, errs in by_host.items():
            last_err = 0
            delay = None
            for i, err in enumerate(errs, start=1):
                err_w = sum(errs[max(0, i - w) : i])
                if err:
                    last_err = i
                delay = max(lo, min(hi, base * 2 ** min(err_w, cap) - step * (i - last_err)))
            out[host] = (len(errs), sum(errs), delay)
        return out

    def test_matches_sequential_reference(self, spark):
        t0 = datetime(2024, 1, 1)
        events = []
        for i in range(200):
            host = f"h{i % 3}"
            # deterministic error pattern with bursts
            err = (i * 7) % 13 < 3
            events.append((host, t0.replace(second=0, microsecond=i * 1000), i, err))
        df = spark.createDataFrame(events, ["host", "ts", "event_id", "is_error"])
        got = {
            r["host"]: (r["n_events"], r["n_errors"], r["recommended_delay_ms"])
            for r in crawlqc.adaptive_politeness(df).collect()
        }
        assert got == self._reference(events)

    def test_backoff_and_recovery(self, spark):
        t0 = datetime(2024, 1, 1)
        # 3 errors then 10 successes: delay decays additively from 8000
        evs = [("h", t0.replace(microsecond=i * 1000), i, i < 3) for i in range(13)]
        df = spark.createDataFrame(evs, ["host", "ts", "event_id", "is_error"])
        r = crawlqc.adaptive_politeness(df).collect()[0]
        assert r["n_errors"] == 3
        assert r["recommended_delay_ms"] == 8000 - 100 * 10

    def test_single_host_shuffle(self, spark):
        t0 = datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(f"h{i % 4}", t0, i, False) for i in range(64)],
            ["host", "ts", "event_id", "is_error"],
        ).repartition(8)
        plan = plan_of(crawlqc.adaptive_politeness(df))
        # one exchange for the host window; the final groupBy(host) reuses
        # the window's partitioning instead of shuffling again
        assert plan.count("Arguments: hashpartitioning") == 1


class TestScriptProfile:
    def test_fractions(self, spark):
        docs = spark.createDataFrame(
            [("en", "abcde12345"), ("ru", "привет"), ("en", "")],
            ["lang", "text"],
        )
        got = {r["lang"]: r for r in crawlqc.script_profile(docs).collect()}
        # empty doc contributes null fraction -> avg over the single non-null
        assert got["en"]["latin_frac"] == 0.5
        assert got["en"]["digit_frac"] == 0.5
        assert got["ru"]["cyrillic_frac"] == 1.0
        assert got["ru"]["cyrillic_dominant_docs"] == 1
        assert got["en"]["cyrillic_dominant_docs"] == 0


class TestQualityEnsemble:
    def test_z_scores_and_deciles(self, spark):
        texts = [
            (1, "the of and to in a is that for it"),   # all stopwords
            (2, "alpha beta gamma delta epsilon zeta"), # diverse, no stopwords
            (3, "word word word word word word word"),  # repetitive
            (4, "the quick brown fox jumps over it"),
        ]
        got = crawlqc.quality_ensemble(
            spark.createDataFrame(texts, ["doc_id", "text"]), n_buckets=2
        ).collect()
        by_id = {r["doc_id"]: r for r in got}
        # hand-check one signal end-to-end: doc 3 has the lowest TTR and no
        # stopwords -> lowest composite -> last bucket
        assert by_id[3]["decile"] == 2
        assert len({r["decile"] for r in got}) == 2
        # z-average of z-scores sums to ~0 across the corpus
        assert abs(sum(r["quality_z"] for r in got)) < 1e-3

    def test_deterministic_across_partitioning(self, spark):
        rows = [(i, f"tok{i} tok{i%5} the of and word{i%7}") for i in range(100)]
        df1 = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(1)
        df32 = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(32)
        a = sorted(map(tuple, crawlqc.quality_ensemble(df1).collect()))
        b = sorted(map(tuple, crawlqc.quality_ensemble(df32).collect()))
        assert a == b

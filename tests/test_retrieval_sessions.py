"""Unit + plan tests for the round-5 additions: BM25 retrieval, RAG
chunking, sessionization, DSIR weights, duplicated spans, corpus profile.

Each operator gets (a) a hand-computable semantics check on a tiny literal
input and (b) where the 100-TB story depends on it, a physical-plan pin
(zero-shuffle maps stay maps, top-k stays TakeOrderedAndProject)."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from searchgov_spider_spark.operators import curation, dedup, retrieval, sessions, textstats

from test_plans import plan_of


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------------------
# chunk_documents
# ---------------------------------------------------------------------------


class TestChunking:
    def test_chunk_counts_and_coverage(self, spark):
        n = 130  # 130 tokens, size 64 stride 48 -> ceil(66/48)+1 = 3 chunks
        text = " ".join(f"t{i}" for i in range(n))
        out = retrieval.chunk_documents(_docs(spark, [(1, text)]), 64, 48).collect()
        assert [r.chunk_idx for r in out] == [0, 1, 2]
        assert [r.start_token for r in out] == [0, 48, 96]
        assert [r.n_chunk_tokens for r in out] == [64, 64, 34]
        # every token covered, consecutive chunks overlap by 16
        assert out[0].chunk_text.split()[48:] == out[1].chunk_text.split()[:16]
        assert out[-1].chunk_text.split()[-1] == f"t{n - 1}"

    def test_small_and_empty_docs(self, spark):
        out = retrieval.chunk_documents(
            _docs(spark, [(1, "only three tokens"), (2, ""), (3, "%%%")]), 64, 48
        ).collect()
        # 3-token doc -> exactly one short chunk; token-less docs -> no rows
        assert len(out) == 1 and out[0].doc_id == 1 and out[0].n_chunk_tokens == 3

    def test_exact_boundary_is_one_chunk(self, spark):
        text = " ".join(f"t{i}" for i in range(64))
        out = retrieval.chunk_documents(_docs(spark, [(1, text)]), 64, 48).collect()
        assert len(out) == 1 and out[0].n_chunk_tokens == 64

    def test_hash_is_md5_of_text(self, spark):
        out = retrieval.chunk_documents(_docs(spark, [(1, "a b")]), 64, 48).collect()[0]
        assert out.chunk_hash == hashlib.md5(out.chunk_text.encode()).hexdigest()

    def test_zero_shuffle_pure_jvm(self, spark, sf_dir):
        df = retrieval.chunk_documents(spark.read.parquet(f"{sf_dir}/documents.parquet"))
        plan = plan_of(df, "simple")
        assert "Exchange" not in plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# bm25_topk
# ---------------------------------------------------------------------------


class TestBM25:
    def test_matches_hand_computation(self, spark):
        corpus = [
            (0, "apple banana apple cherry"),
            (1, "banana banana durian"),
            (2, "cherry cherry cherry cherry"),
            (3, "unrelated words only here"),
        ]
        out = {
            r.doc_id: (r.n_terms_hit, r.bm25)
            for r in retrieval.bm25_topk(_docs(spark, corpus), "apple banana", k=4).collect()
        }
        # independent recomputation
        import re

        docs = {i: re.findall(r"[a-z0-9]+", t.lower()) for i, t in corpus}
        n, avgdl = len(docs), sum(len(v) for v in docs.values()) / len(docs)
        df = {t: sum(t in v for v in docs.values()) for t in ("apple", "banana")}
        exp = {}
        for i, toks in docs.items():
            s, hit = 0.0, 0
            for t in ("apple", "banana"):
                tf = toks.count(t)
                if not tf:
                    continue
                hit += 1
                idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
            if hit:
                exp[i] = (hit, round(s, 6))
        assert out == exp
        assert 3 not in out  # docs hitting no term never surface

    def test_plan_broadcasts_and_take_ordered(self, spark, sf_dir):
        df = retrieval.bm25_topk(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), "spark window merge", k=10
        )
        plan = plan_of(df, "simple")
        assert "TakeOrderedAndProject" in plan  # top-k never global-sorts
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------


class TestSessions:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp_ntz, user_id long, value double"
        )

    def test_gap_boundary_semantics(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows = [
            (1, t0, 7, 1.0),
            # exactly 30 min later: same session (strictly-greater contract)
            (2, t0 + dt.timedelta(minutes=30), 7, 2.0),
            # 30 min + 1 us later: new session
            (3, t0 + dt.timedelta(minutes=60, microseconds=1), 7, 4.0),
            (4, t0, 8, 8.0),  # other user: independent numbering
        ]
        out = {
            (r.user_id, r.session_idx): r
            for r in sessions.sessionize(self._events(spark, rows), 30).collect()
        }
        assert set(out) == {(7, 1), (7, 2), (8, 1)}
        assert out[(7, 1)].n_events == 2 and out[(7, 1)].total_value == 3.0
        assert out[(7, 1)].duration_us == 30 * 60 * 1_000_000
        assert out[(7, 2)].n_events == 1 and out[(7, 2)].duration_us == 0

    def test_single_exchange_on_user_key(self, spark, sf_dir):
        df = sessions.sessionize(spark.read.parquet(f"{sf_dir}/events.parquet"), 30)
        plan = plan_of(df, "simple")
        # window + rollup share the user-key partitioning: one exchange only
        assert plan.count("Exchange hashpartitioning") == 1


# ---------------------------------------------------------------------------
# dsir_log_weights
# ---------------------------------------------------------------------------


class TestDSIR:
    def test_matches_independent_recomputation(self, spark):
        rows = [
            (0, "alpha beta alpha", "en"),
            (1, "gamma beta", "en"),
            (2, "gamma gamma delta", "de"),
            (3, "", "de"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        out = {r.doc_id: r for r in curation.dsir_log_weights(df, "lang = 'en'").collect()}

        def bucket(t):
            return int(hashlib.md5(t.encode()).hexdigest()[:6], 16) % 256

        toks = {i: t.lower().split() for i, t, _ in [(r[0], r[1], r[2]) for r in rows]}
        ct, cr = {}, {}
        for i, ts in toks.items():
            for t in ts:
                b = bucket(t)
                cr[b] = cr.get(b, 0) + 1
                if rows[i][2] == "en":
                    ct[b] = ct.get(b, 0) + 1
        tt, rt = sum(ct.values()) + 256, sum(cr.values()) + 256
        for i, ts in toks.items():
            if not ts:
                assert out[i].dsir_log_weight is None
                continue
            w = sum(
                math.log2(((ct.get(bucket(t), 0) + 1) * rt) / ((cr[bucket(t)] + 1) * tt))
                for t in ts
            ) / len(ts)
            assert out[i].dsir_log_weight == pytest.approx(round(w, 6), abs=1e-6)
        # direction: the all-target vocabulary scores above the non-target one
        assert out[0].dsir_log_weight > out[2].dsir_log_weight

    def test_scoring_is_zero_shuffle_map(self, spark, sf_dir):
        df = curation.dsir_log_weights(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), "lang = 'en'"
        )
        plan = plan_of(df, "simple")
        assert "Exchange" not in plan  # LM burned in as literals -> pure map
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# duplicated_spans
# ---------------------------------------------------------------------------


class TestDupSpans:
    def test_span_merge_and_fraction(self, spark):
        shared = " ".join(f"s{i}" for i in range(12))  # 12 shared tokens -> 3 dup 10-grams
        rows = [
            (0, shared + " " + " ".join(f"a{i}" for i in range(20))),
            (1, " ".join(f"b{i}" for i in range(5)) + " " + shared),
            (2, " ".join(f"c{i}" for i in range(15))),  # no duplication
        ]
        out = {r.doc_id: r for r in dedup.duplicated_spans(_docs(spark, rows), k=10).collect()}
        # doc 0: dup positions 0,1,2 -> one span covering tokens 0..11 (12 tokens)
        assert out[0].n_dup_spans == 1 and out[0].dup_tokens == 12
        assert out[0].dup_token_frac == round(12 / 32, 6)
        assert out[1].n_dup_spans == 1 and out[1].dup_tokens == 12
        assert out[2].n_dup_spans == 0 and out[2].dup_tokens == 0

    def test_touching_spans_merge_gapped_do_not(self, spark):
        # two shared 10-gram blocks in one doc separated by > k unique tokens
        blk1 = " ".join(f"x{i}" for i in range(10))
        blk2 = " ".join(f"y{i}" for i in range(10))
        gap = " ".join(f"g{i}" for i in range(15))
        rows = [
            (0, blk1 + " " + gap + " " + blk2),
            (1, blk1),
            (2, blk2),
        ]
        out = {r.doc_id: r for r in dedup.duplicated_spans(_docs(spark, rows), k=10).collect()}
        assert out[0].n_dup_spans == 2 and out[0].dup_tokens == 20
        # the 10-token docs equal one whole gram each: duplicated in full
        assert out[1].n_dup_spans == 1 and out[1].dup_tokens == 10

    def test_short_docs_have_no_grams(self, spark):
        out = dedup.duplicated_spans(
            _docs(spark, [(0, "under ten tokens here"), (1, "under ten tokens here")]), k=10
        ).collect()
        assert all(r.n_dup_spans == 0 for r in out)


# ---------------------------------------------------------------------------
# corpus_profile
# ---------------------------------------------------------------------------


class TestCorpusProfile:
    def test_exact_quantiles_linear_interpolation(self, spark):
        import numpy as np

        rows = [(i, " ".join(["w"] * n), "en") for i, n in enumerate([1, 2, 3, 4, 100])]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        out = textstats.corpus_profile(df).collect()[0]
        lens = [1, 2, 3, 4, 100]
        assert out.n_docs == 5 and out.total_tokens == 110
        assert out.distinct_tokens == 1
        for col, q in (("p50_tokens", 50), ("p90_tokens", 90), ("p99_tokens", 99)):
            assert getattr(out, col) == pytest.approx(
                round(float(np.percentile(lens, q)), 4), abs=1e-4
            )

    def test_approx_variant_same_schema(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        exact = textstats.corpus_profile(docs, exact=True)
        approx = textstats.corpus_profile(docs, exact=False)
        assert exact.schema == approx.schema
        # medians agree at this scale even for the sketch
        e = {r.lang: r.p50_tokens for r in exact.collect()}
        a = {r.lang: r.p50_tokens for r in approx.collect()}
        assert set(e) == set(a)

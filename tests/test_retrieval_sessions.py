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


# ---------------------------------------------------------------------------
# winnow_fingerprints
# ---------------------------------------------------------------------------


class TestWinnowing:
    def _fp(self, text, k=5, w=4):
        """Independent pure-Python winnowing (leftmost-min tie rule)."""
        import re

        toks = re.findall(r"[a-z0-9]+", text.lower())
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
        if not hs:
            return set()
        if len(hs) < w:
            m = min(hs)
            return {(hs.index(m), m)}
        out = set()
        for i in range(len(hs) - w + 1):
            win = hs[i : i + w]
            m = min(win)
            out.add((i + win.index(m), m))
        return out

    def test_matches_pure_python(self, spark):
        texts = [
            "the quick brown fox jumps over the lazy dog and runs away fast",
            "short doc",  # < k tokens -> no fingerprints
            "one two three four five six",  # 2 grams, < w -> global min only
            "a a a a a a a a a a a a",  # all-equal hashes: tie rule exercised
        ]
        rows = [(i, t) for i, t in enumerate(texts)]
        got = {}
        for r in dedup.winnow_fingerprints(_docs(spark, rows), k=5, w=4).collect():
            got.setdefault(r.doc_id, set()).add((r.pos, r.fingerprint))
        for i, t in enumerate(texts):
            exp = self._fp(t)
            assert got.get(i, set()) == exp, f"doc {i}"

    def test_shared_substring_guarantee(self, spark):
        # winnowing guarantee: a shared run of >= k+w-1 tokens shares a
        # selected fingerprint
        shared = " ".join(f"s{i}" for i in range(8))  # k+w-1 = 8
        rows = [(0, "left filler words " + shared), (1, shared + " other tail stuff")]
        got = {}
        for r in dedup.winnow_fingerprints(_docs(spark, rows), k=5, w=4).collect():
            got.setdefault(r.doc_id, set()).add(r.fingerprint)
        assert got[0] & got[1]

    def test_zero_shuffle(self, spark, sf_dir):
        df = dedup.winnow_fingerprints(spark.read.parquet(f"{sf_dir}/documents.parquet"))
        plan = plan_of(df, "simple")
        assert "Exchange" not in plan
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------


class TestAsofJoin:
    def _df(self, spark, rows, schema):
        return spark.createDataFrame(rows, schema)

    def test_backward_inclusive_semantics(self, spark):
        from searchgov_spider_spark.operators import temporal

        left = self._df(
            spark,
            [(1, 10, 100), (2, 10, 205), (3, 10, 99), (4, 20, 500)],
            "lid long, key long, us long",
        )
        right = self._df(
            spark,
            [(7, 10, 100, 1.5), (8, 10, 200, 2.5), (9, 30, 1, 9.9)],
            "rid long, key long, us long, px double",
        )
        out = {
            r.lid: r
            for r in temporal.asof_join(
                left, right, on="key", left_ts="us", right_ts="us",
                right_cols=["px", "rid"],
            ).collect()
        }
        assert out[1].px == 1.5 and out[1].us_right == 100  # equality is inclusive
        assert out[2].px == 2.5 and out[2].rid == 8  # latest at-or-before 205
        assert out[3].px is None and out[3].us_right is None  # nothing prior
        assert out[4].px is None  # key never quoted
        assert len(out) == 4  # left join: every left row survives

    def test_same_ts_dedup_is_max_payload(self, spark):
        from searchgov_spider_spark.operators import temporal

        left = self._df(spark, [(1, 5, 50)], "lid long, key long, us long")
        right = self._df(
            spark,
            [(70, 5, 50, 1.0), (71, 5, 50, 3.0), (72, 5, 50, 2.0)],
            "rid long, key long, us long, px double",
        )
        out = temporal.asof_join(
            left, right, on="key", left_ts="us", right_ts="us", right_cols=["px", "rid"]
        ).collect()[0]
        assert out.px == 3.0 and out.rid == 71  # max over (px, rid) struct

    def test_single_exchange_on_key(self, spark, sf_dir):
        from searchgov_spider_spark.operators import temporal

        e = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
            "event_id", "user_id", "value", "unix_micros(cast(ts as timestamp)) us"
        )
        df = temporal.asof_join(
            e.filter("event_id % 2 = 1"), e.filter("event_id % 2 = 0"),
            on="user_id", left_ts="us", right_ts="us", right_cols=["value", "event_id"],
        )
        plan = plan_of(df, "simple")
        # right-side (key, ts) dedup agg + the merged window share the
        # user-key partitioning; the union's left leg adds its own exchange
        assert plan.count("Exchange hashpartitioning") <= 2
        assert "SortMergeJoin" not in plan and "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# inverted_index
# ---------------------------------------------------------------------------


class TestInvertedIndex:
    def test_postings_and_blocks(self, spark):
        from searchgov_spider_spark.operators import retrieval

        rows = [
            (0, "apple banana apple"),
            (1, "banana cherry"),
            (150, "apple apple apple"),  # block 1 at span 100
        ]
        out = {
            (r.term, r.block): r
            for r in retrieval.inverted_index(_docs(spark, rows), block_span=100).collect()
        }
        a0 = out[("apple", 0)]
        assert a0.df == 1 and a0.total_tf == 2 and a0.postings == "0:2"
        b0 = out[("banana", 0)]
        assert b0.df == 2 and b0.total_tf == 2 and b0.postings == "0:1,1:1"
        a1 = out[("apple", 1)]
        assert a1.df == 1 and a1.total_tf == 3 and a1.postings == "150:3"
        assert ("cherry", 0) in out and ("cherry", 1) not in out

    def test_block_bounds_hot_term_rows(self, spark):
        from searchgov_spider_spark.operators import retrieval

        # a stop-word in every doc splits into ceil(n/span) block rows
        rows = [(i, "the filler") for i in range(10)]
        out = retrieval.inverted_index(_docs(spark, rows), block_span=3).collect()
        the_blocks = sorted(r.block for r in out if r.term == "the")
        assert the_blocks == [0, 1, 2, 3]
        assert all(r.df <= 3 for r in out)


# ---------------------------------------------------------------------------
# tfidf_top_terms
# ---------------------------------------------------------------------------


class TestTfidf:
    def test_matches_hand_computation(self, spark):
        from searchgov_spider_spark.operators import retrieval

        corpus = [
            (0, "apple apple banana"),
            (1, "banana cherry cherry"),
            (2, "apple cherry durian"),
        ]
        out = {}
        for r in retrieval.tfidf_top_terms(_docs(spark, corpus), top_k=2).collect():
            out.setdefault(r.doc_id, []).append((r.rank, r.term, r.tf, r.df, r.tfidf))
        df = {"apple": 2, "banana": 2, "cherry": 2, "durian": 1}

        def tfidf(tf, d):
            return round(tf * math.log(4 / (d + 1)), 6)

        # doc 0: apple tf2 beats banana tf1
        assert sorted(out[0]) == [
            (1, "apple", 2, 2, tfidf(2, 2)),
            (2, "banana", 1, 2, tfidf(1, 2)),
        ]
        # doc 2: durian (df1) outscores apple/cherry (df2) at equal tf;
        # apple beats cherry on the term tie-break at equal tfidf
        assert sorted(out[2]) == [
            (1, "durian", 1, 1, tfidf(1, 1)),
            (2, "apple", 1, 2, tfidf(1, 2)),
        ]

    def test_no_global_sort(self, spark, sf_dir):
        from searchgov_spider_spark.operators import retrieval

        df = retrieval.tfidf_top_terms(spark.read.parquet(f"{sf_dir}/documents.parquet"))
        plan = plan_of(df, "simple")
        assert "Exchange rangepartitioning" not in plan  # window is per-doc, no global sort

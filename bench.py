#!/usr/bin/env python
"""Benchmark harness (driver contract): one JSON line on stdout.

Headline = the flagship crawl (URLs fetched+deduped/sec) over the
deterministic synthetic web at the target scale factor at local[CPUS], plus
the north_rule's two-cluster-size scaling evidence: the SAME crawl on the
SAME 2M-page input at local[2] vs local[8] (N and 4N cores), efficiency =
(rate_8 / rate_2) / 4.  2-vs-8 stays under the 32-core box's contention
knee — a pure-multiprocessing control measures the machine's own ceiling
at ~0.94 there vs ~0.74 at 8→32 (see BENCH.md) — so the number reflects
engine scaling, not host throttling.

Plus per-query wall seconds for the headline relational / dedup / similarity
queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Env knobs:
  SPARK_GRAFT_SF_DIR    testdata dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS      headline parallelism (default 32)
  BENCH_SKIP_SCALING    set to skip the 2-vs-8 scaling runs (fast iteration)
  BENCH_CRAWL_PAGES     override headline synthetic web size
  BENCH_SCALING_PAGES   override scaling web size (default 2,000,000 — big
                        enough that per-round driver fixed cost ~6 s is
                        under 15% of the 8-core round wall; see BENCH.md)
  BENCH_MEM_PER_CORE_GB JVM heap GB per emulated core (default 2; cluster
                        emulation memory parity — see MEM_PER_CORE_GB)
  BENCH_LOAD_SLACK      external-load headroom for the gate (default 4.0)
  BENCH_LOAD_MAX_WAIT   max seconds to wait for a quiet window (default 150)
  BENCH_LOAD_ATTEMPTS   max runs per gated phase incl. retries (default 3)
  BENCH_EXT_CPU_LIMIT   max external busy cores (measured via /proc/stat
                        minus our own children's CPU) to accept a phase
                        (default 1.5)
  BENCH_LOAD_GATE       set to 0 to disable the load gate entirely
                        (also disables the scaling consistency vote)
  BENCH_CONSISTENCY_TOL max billed-wall divergence between a scaling
                        bucket's two identical-work runs before the
                        best-2-of-3 tie-breaker fires (default 1.15)
  BENCH_STRAGGLER_MIN   min per-worker bandwidth straggler_ratio to start
                        the unpinned headline phase (default 0.85)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)
# Python workers resolve the package through PYTHONPATH, not the driver's
# sys.path — exporting it makes the bench runnable from any cwd
os.environ["PYTHONPATH"] = _REPO_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")

from searchgov_spider_spark.session import build_session  # noqa: E402
from searchgov_spider_spark.synth import webgen  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# GB of JVM heap per emulated core (cluster-emulation memory parity: an
# N-core executor host has N cores AND ~N x the memory of an N/4-core one;
# a heap FIXED across core counts hands the 2-core run 4 GB/core but the
# 8-core run 1 GB/core, so the high side GC-thrashes on exactly the big
# rounds the scaling gate measures).  Every Spark phase sizes its single
# local-mode JVM at MEM_PER_CORE_GB x cores unless SPARK_DRIVER_MEMORY is
# set explicitly.  Measured A/B at 2M pages, quiet host: fixed 8 GB reads
# 0.708 whole-crawl efficiency (hi side 9,781 URLs/s), 2 GB/core reads
# 0.957 (hi side 12,684) — the fixed heap was billing JVM GC starvation,
# not engine scaling, to the high-core side.
MEM_PER_CORE_GB = int(os.environ.get("BENCH_MEM_PER_CORE_GB", "2"))


def _size_heap(cores: int) -> None:
    """Default SPARK_DRIVER_MEMORY to cores-proportional before the JVM
    launches (local mode: driver heap IS the executor heap).  An explicit
    SPARK_DRIVER_MEMORY env always wins."""
    os.environ.setdefault("SPARK_DRIVER_MEMORY", f"{max(4, MEM_PER_CORE_GB * cores)}g")

# ---- host-load gate (VERDICT r4 #1) -----------------------------------------
# This box runs processes outside the sandbox's control; 1-min load bursts of
# 10-17 have crushed the pinned low-core scaling phases in two driver-recorded
# rounds (the ratio degrades, not just the absolutes, because external load
# hits the small-pinned run hardest).  The gate makes the bench defend itself:
# wait (bounded) for a quiet window before each gated phase, sample the load
# DURING the run, and retry once if the during-run load shows a burst.  Every
# attempt — accepted or not — is declared in the artifact.
LOAD_SLACK = float(os.environ.get("BENCH_LOAD_SLACK", "4.0"))
LOAD_MAX_WAIT = float(os.environ.get("BENCH_LOAD_MAX_WAIT", "150"))
LOAD_ATTEMPTS = max(1, int(os.environ.get("BENCH_LOAD_ATTEMPTS", "3")))
LOAD_GATE_ON = os.environ.get("BENCH_LOAD_GATE", "1") != "0"
# Primary acceptance signal (round 5): EXTERNAL CPU measured exactly, not
# inferred from loadavg.  /proc/stat gives the whole box's busy core-seconds
# over the phase; getrusage(RUSAGE_CHILDREN) gives OUR phase subprocesses'
# core-seconds; the difference is other tenants' CPU.  loadavg's 1-min EMA
# smears 10-20 s bursts below any threshold (a gated round-4/5 run was
# accepted at during-mean 5-6 while the high phase lost 40% throughput);
# the busy-jiffy delta cannot miss them.  A phase is accepted when external
# usage averaged below EXT_CPU_LIMIT cores for its whole window.
EXT_CPU_LIMIT = float(os.environ.get("BENCH_EXT_CPU_LIMIT", "1.5"))

BENCH_QUERIES = [
    "q01_pricing_summary",
    "q02_revenue_by_nation",
    "q06_revenue_forecast",
    "q07_top_orders_per_customer",
    "q10_events_daily",
    "q16_exact_dedup",
    "q17_token_stats",
    "q18_minhash_signature",
    "q21_cosine_topk",
    "q22_text_analysis",
    "q25_lsh_near_dup_pairs",
    # round-3 curation family (no prior-round range)
    "q40_decontamination",
    "q44_line_dedup",
    "q45_dedup_clusters",
    # round-4: embedding-modality cluster assembly
    "q48_embedding_dup_clusters",
    # round-5: LM scoring, pure-map classifier, iterative graph rank
    "q51_bigram_surprisal",
    "q52_quality_classifier",
    "q54_pagerank",
    # round-5 corpus-health family: heaviest of the new metrics (explodes
    # 1/2/3-grams over the whole corpus; q96-q99/q101/q102 are embedding- or
    # vocab-sized and add no bench signal at sf scale)
    "q100_ngram_diversity",
    # round-5 shipped-dedup end state: q45's pipeline + per-cluster survivor
    # agg — what a production dedup actually emits (q104/q105 are pure maps /
    # window-over-slice and add no bench signal at sf scale)
    "q103_cluster_survivors",
    # round-5 iterative-training family: the 8-merge Sennrich loop + corpus
    # re-encode (vocabulary-sized iterations; q108's logreg is one narrow agg
    # per iteration and adds no bench signal at sf scale)
    "q110_bpe_encode",
    # round-5 late additions: KN bigram LM (the heaviest of the three —
    # corpus-wide (doc,bigram) collapse + three vocab-sized stat joins),
    # OPIC's 5 contribution-join iterations, and the pure-map span
    # corruption (q122's shard plan is host-table-sized: no bench signal)
    "q121_kn_surprisal",
    "q123_opic",
    "q124_span_corruption",
    # q125-q131 add no DISTINCT bench signal at sf scale: q129 trustrank is
    # q54's exact iteration shape (one join + one groupBy per round), q130's
    # anchor set and q131's image fixture are bounded by construction, and
    # q125-q128 are pure maps / one-groupBy rollups priced by existing rows.
]


def _sf() -> float:
    base = os.path.basename(SF_DIR.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def _warmup_crawl(spark, n_hosts: int) -> None:
    """JIT/codegen + Arrow-worker warm-up: a small throwaway crawl so the
    measured run sees a warm JVM (steady-state engine throughput is the
    metric; first-job whole-stage-codegen compilation is a per-JVM constant
    that would otherwise be billed disproportionately to the high-core run)."""
    from searchgov_spider_spark.crawl import CrawlEngine, CrawlPolicy
    from searchgov_spider_spark.crawl.fetch import GeneratorFetcher

    robots = spark.createDataFrame(webgen.robots_pandas(min(n_hosts, 8)))
    policy = CrawlPolicy(allowed_domains=["example.gov"], depth_limit=50)
    ckpt = tempfile.mkdtemp(prefix="bench_warmup_")
    engine = CrawlEngine(
        spark, None, robots, policy, ckpt,
        fetcher=GeneratorFetcher(2000, min(n_hosts, 8), branch=8),
        round_seconds=1e7, bloom_shards=4, bloom_bits=1 << 16,
    )
    engine.run([webgen.page_url(h, 0) for h in range(min(n_hosts, 8))], max_rounds=16)
    shutil.rmtree(ckpt, ignore_errors=True)


def crawl_bench(
    cores: int,
    n_pages: int,
    n_hosts: int,
    branch: int = 8,
    shuffle_partitions: int | None = None,
    seed_rounds: int = 0,
    bloom_min_seen: int | None = None,
) -> dict:
    """One crawl at local[cores]; returns urls/s and wall seconds.

    shuffle.partitions defaults to 2x the core count — sized to the cluster,
    as any real deployment sizes it (a fixed 32 at local[2] runs 32 tiny
    tasks per exchange and doubles whole-crawl wall; AQE cannot coalesce
    explicit repartitions).

    ``seed_rounds`` > 0 runs that many UNBILLED frontier-growing rounds
    first, then times the resumed remainder: at a 10^10-URL frontier (the
    north_rule design point) every round is deep, so the scaling comparison
    measures the steady state the rule is about, not the 2-3 tiny bootstrap
    rounds whose ~3 s fixed cost is core-count-independent.  The seed phase
    runs on the SAME engine/core count (checkpoint on disk, resume=True), so
    the measured window is identical deterministic work at every core count.
    """
    from searchgov_spider_spark.crawl import CrawlEngine, CrawlPolicy

    _size_heap(cores)
    spark = build_session(
        app_name=f"bench-crawl-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=shuffle_partitions or 2 * cores,
    )
    try:
        from searchgov_spider_spark.crawl.fetch import GeneratorFetcher

        _warmup_crawl(spark, n_hosts)
        robots = spark.createDataFrame(webgen.robots_pandas(n_hosts))
        gen_s = 0.0
        policy = CrawlPolicy(allowed_domains=["example.gov"], depth_limit=50)
        ckpt = tempfile.mkdtemp(prefix=f"bench_crawl_{cores}_")
        # bloom_min_seen: the SCALING phases force it low (seeded runs —
        # the one-time full build lands in the UNBILLED seed phase and every
        # measured round exercises the probe + incremental-merge path, the
        # 10^10 steady state).  The HEADLINE phase uses the engine's own
        # size-based default (500k): at a ~150k-URL crawl the probe's
        # per-round broadcast + candidate pass costs more than the small
        # anti-join it prunes — measured A/B at sf0.1/32 cores: 31.4 s plain
        # vs 52.4 s bloom-forced (BENCH.md "bloom crossover").  Overriding
        # the engine's crossover for the headline biased rounds 4-5
        # headline numbers DOWN ~40% vs round 3.
        engine = CrawlEngine(
            spark, None, robots, policy, ckpt,
            fetcher=GeneratorFetcher(n_pages, n_hosts, branch=branch),
            round_seconds=1e7,  # ample politeness budget: measure engine throughput
            bloom_shards=32, bloom_bits=1 << 22,
            **(
                {"bloom_min_seen": int(os.environ["BENCH_BLOOM_MIN_SEEN"])}
                if "BENCH_BLOOM_MIN_SEEN" in os.environ
                else ({"bloom_min_seen": bloom_min_seen} if bloom_min_seen is not None else {})
            ),
        )
        # seed list = every host root (the reference crawls a 1,790-seed list;
        # breadth comes from the seeds, not from cross-host link chains)
        start_urls = [webgen.page_url(h, 0) for h in range(n_hosts)]
        seed_fetched = 0
        if seed_rounds:
            seed_run = engine.run(start_urls, max_rounds=seed_rounds)
            seed_fetched = seed_run.total_fetched()
            # NOT compacted here: at this toy seen-size (~0.5M rows) the
            # bucketed SMJ's per-round sort costs more than the AQE hash
            # join it replaces (measured: whole-window 0.79 vs 0.83) — the
            # bucketed path pays off when the seen side dwarfs the
            # candidates (10^10), and is plan-audited + correctness-tested
            # separately (tests/test_checkpoint_maintenance.py)
        t0 = time.monotonic()
        run = (
            engine.run(start_urls, max_rounds=64, resume=True)
            if seed_rounds
            else engine.run(start_urls, max_rounds=64)
        )
        wall = time.monotonic() - t0
        # a resumed run's CrawlRun only contains the rounds IT executed, so
        # its totals already exclude the unbilled seed phase
        fetched = run.total_fetched()
        measured = run.metrics
        deduped = sum(m.get("admitted", 0) for m in measured)
        shutil.rmtree(ckpt, ignore_errors=True)
        # deep rounds = the crawl's steady state (>= 10% of fetched pages each);
        # their rate is the number that holds as the frontier grows without
        # bound, reported alongside the whole-crawl rate
        deep_thresh = max(1, fetched // 10)
        deep = [m for m in measured if m.get("selected", 0) >= deep_thresh]
        deep_wall = sum(m["round_wall_s"] for m in deep)
        deep_fetched = sum(m.get("fetched", 0) for m in deep)
        # drain/stop tail = the maximal sub-deep SUFFIX of the measured
        # window (frontier exhaustion + the stop round).  Like the seed
        # phase it is identical deterministic work at every core count and
        # fixed-cost-dominated, so the billed window excludes it SYMMETRICALLY
        # and declares it here (sizes + walls) — at the north_rule's 10^10-URL
        # design point the crawl never drains, so the billed window is the
        # steady state the rule is about.
        tail_start = len(measured)
        while tail_start > 0 and measured[tail_start - 1].get("selected", 0) < deep_thresh:
            tail_start -= 1
        tail = measured[tail_start:]
        tail_wall = sum(m["round_wall_s"] for m in tail)
        tail_fetched = sum(m.get("fetched", 0) for m in tail)
        billed_wall = wall - tail_wall
        billed_fetched = fetched - tail_fetched
        return {
            "cores": cores,
            "wall_s": round(wall, 2),
            "gen_s": round(gen_s, 2),
            "fetched": fetched,
            "admitted": deduped,
            "rounds": run.rounds,
            "seed_rounds_unbilled": seed_rounds,
            "seed_fetched_unbilled": seed_fetched,
            "urls_per_sec": round(fetched / wall, 2) if wall > 0 else 0.0,
            "deep_urls_per_sec": round(deep_fetched / deep_wall, 2) if deep_wall > 0 else 0.0,
            "deep_rounds": len(deep),
            "tail_rounds_unbilled": len(tail),
            "tail_selected": [m.get("selected", 0) for m in tail],
            "tail_wall_s": round(tail_wall, 2),
            "tail_fetched": tail_fetched,
            "billed_wall_s": round(billed_wall, 2),
            "billed_fetched": billed_fetched,
            "billed_urls_per_sec": round(billed_fetched / billed_wall, 2) if billed_wall > 0 else 0.0,
            "deep_wall_s": round(deep_wall, 2),
            "deep_fetched": deep_fetched,
            "round_walls": [m["round_wall_s"] for m in measured],
            "round_selected": [m.get("selected", 0) for m in measured],
            # per-phase walls summed over the measured rounds: separates
            # data-scaled work from core-count-independent fixed cost
            "timing_sums": {
                key: round(sum(m.get("timings", {}).get(key, 0.0) for m in measured), 2)
                for key in sorted({k for m in measured for k in m.get("timings", {})})
            },
        }
    finally:
        spark.stop()


def query_bench(repeats: int = 3) -> dict:
    """Per-query wall seconds: one UNBILLED warm-up execution per query
    (first-query whole-stage-codegen + Arrow-worker spin-up is a per-JVM
    constant, not a property of q01), then ``repeats`` billed runs.  The
    headline number per query is the MEDIAN; min/max are recorded so
    per-query variance is visible in the artifact (host wall drifts
    ±20-30% between runs on this box)."""
    from searchgov_spider_spark import queries as Q

    _size_heap(CPUS)
    spark = build_session(app_name="bench-queries", master=f"local[{CPUS}]")
    timings: dict = {}
    stats: dict = {}
    try:
        for name in BENCH_QUERIES:
            fn = Q.QUERIES[name]
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()  # warm-up, unbilled
            runs = []
            for _ in range(repeats):
                t0 = time.monotonic()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                runs.append(round(time.monotonic() - t0, 3))
            timings[name] = sorted(runs)[len(runs) // 2]
            stats[name] = {"median": timings[name], "min": min(runs), "max": max(runs), "runs": runs}
    finally:
        spark.stop()
    return {"timings": timings, "stats": stats}


def stateful_bench(cores: int, rows: int = 2_000_000, hosts: int = 20_000) -> dict:
    """Throughput of the custom stateful-streaming politeness operator
    (streaming/stateful.rate_limited_frontier): rows/s through
    groupBy(host) -> applyInPandasWithState with a non-binding budget, so
    the number measures the state-store + Arrow-state path itself, not the
    throttle.  An unbilled small run warms the JVM/Arrow workers first.

    Two rates per run: ``rows_per_sec`` bills only the data micro-batches'
    triggerExecution time (the operator's steady-state processing rate —
    query/source initialization is a core-count-independent constant, the
    analog of the crawl bench's deep-round basis);
    ``whole_query_rows_per_sec`` bills the full wall including startup.

    Sizing: 20k hosts ≈ realistic frontier host cardinality; at ~100 rows
    per group the per-group Arrow/pandas work dominates and the operator is
    CPU-bound in the Python workers (scales with cores).  Few-host configs
    measure state-store commit overhead instead and understate scaling."""
    import tempfile as _tf

    from searchgov_spider_spark.streaming.stateful import rate_limited_frontier

    _size_heap(cores)
    spark = build_session(
        app_name=f"bench-stateful-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
    )
    try:
        def one(n_rows: int, n_hosts: int) -> tuple[float, float]:
            src = _tf.mkdtemp(prefix=f"bench_state_src_{cores}_")
            ckpt = _tf.mkdtemp(prefix=f"bench_state_ckpt_{cores}_")
            (
                spark.range(n_rows)
                .selectExpr(
                    f"concat('host', id % {n_hosts}) as host",
                    f"concat('https://h', id % {n_hosts}, '.gov/page/', id) as url_canon",
                    "id as seq",
                )
                .repartition(16)
                .write.mode("overwrite").parquet(src)
            )
            stream = (
                spark.readStream.schema("host string, url_canon string, seq long")
                .parquet(src)
            )
            t0 = time.monotonic()
            q = (
                rate_limited_frontier(stream, capacity=1e12, refill_per_batch=1e12)
                .writeStream.format("noop")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            # a ProcessingTimeTimeout stateful operator keeps scheduling
            # no-data micro-batches (shouldRunAnotherBatch is always true for
            # processing-time timeouts), so availableNow never terminates on
            # its own — poll until every input row has been processed, then
            # stop.
            try:
                while q.isActive:
                    if sum(p["numInputRows"] for p in q.recentProgress) >= n_rows:
                        break
                    time.sleep(0.05)
                wall = time.monotonic() - t0
                batch_s = (
                    sum(
                        p["durationMs"].get("triggerExecution", 0)
                        for p in q.recentProgress
                        if p["numInputRows"] > 0
                    )
                    / 1000.0
                )
            finally:
                q.stop()
            shutil.rmtree(src, ignore_errors=True)
            shutil.rmtree(ckpt, ignore_errors=True)
            return wall, batch_s

        one(20_000, 200)  # unbilled warm-up
        wall, batch_s = one(rows, hosts)
        return {
            "cores": cores,
            "rows": rows,
            "hosts": hosts,
            "wall_s": round(wall, 2),
            "data_batch_s": round(batch_s, 2),
            "rows_per_sec": round(rows / batch_s, 2) if batch_s > 0 else 0.0,
            "whole_query_rows_per_sec": round(rows / wall, 2) if wall > 0 else 0.0,
        }
    finally:
        spark.stop()


def seenjoin_bench(
    cores: int,
    cand: int = 100_000,
    repeats: int = 3,
    sizes: tuple[int, ...] | None = None,
) -> dict:
    """Bucketed vs plain seen-side anti-join at the 10^10 shape (VERDICT r4
    #3): a pre-compacted multi-million-row seen set against a small
    candidate batch — the steady-state frontier dedup once a long crawl's
    visited set dwarfs each round's discoveries.

    Controlled A/B: ``compact_seen`` writes the bucketed layout, and the
    PLAIN side reads the *same files* as ordinary parquet (bucketed files
    are plain parquet), so both plans consume identical bytes — the only
    difference is Exchange+hash-join (plain re-shuffles the seen side every
    round) vs exchange-free bucketed SMJ (only the candidate slice sorts).
    The derived crossover (smallest seen size where bucketed wins) is what
    CrawlEngine's ``bucketed_min_seen`` default encodes."""
    from pyspark.sql import functions as F

    from searchgov_spider_spark.crawl.frontier import dedup_against_seen
    from searchgov_spider_spark.storage.tables import CheckpointStore

    _size_heap(cores)
    spark = build_session(
        app_name=f"bench-seenjoin-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=2 * cores,
    )
    if sizes is None:
        sizes = tuple(
            int(s) for s in os.environ.get("BENCH_SEENJOIN_SIZES", "500000,2000000,8000000").split(",")
        )
    out: dict = {"cores": cores, "cand_rows": cand, "repeats": repeats, "points": []}
    try:
        far = 10 * max(sizes)
        for S in sizes:
            ckpt = tempfile.mkdtemp(prefix=f"bench_seenjoin_{S}_")
            store = CheckpointStore(ckpt)
            (
                spark.range(S)
                .selectExpr(
                    "concat('https://h', id % 1000, '.example.gov/p/', id) as url_canon",
                    "0 as depth",
                    "id as seq",
                )
                .withColumn("url_hash", F.xxhash64("url_canon"))
                .select("url_hash", "url_canon", "depth", "seq")
                .write.mode("overwrite")
                .parquet(store.seed_seen_dir())
            )
            store.compact_seen(spark, upto_round=-1)  # unbilled: one-time maintenance
            bucketed = store.read_seen_bucketed(spark)
            plain = spark.read.parquet(store.seed_seen_dir()).select(
                "url_hash", "url_canon", "depth", "seq"
            )
            # candidate batch: half already-seen (pruned), half genuinely new
            cand_df = (
                spark.range(cand)
                .selectExpr(
                    "concat('https://h', id % 1000, '.example.gov/p/', "
                    f"CASE WHEN id % 2 = 0 THEN id ELSE id + {far} END) as url_canon",
                    "0 as depth",
                    "0 as seq",
                )
                .withColumn("url_hash", F.xxhash64("url_canon"))
                .persist()
            )
            cand_df.count()

            def one(use_bucketed: bool) -> tuple[float, int]:
                t0 = time.monotonic()
                n = dedup_against_seen(
                    spark,
                    cand_df,
                    seen=None if use_bucketed else plain,
                    bloom=None,
                    seen_bucketed=bucketed if use_bucketed else None,
                ).count()
                return time.monotonic() - t0, n

            point: dict = {"seen_rows": S}
            for label, flag in (("bucketed", True), ("plain", False)):
                one(flag)  # warm-up, unbilled
                walls, ns = [], set()
                for _ in range(repeats):
                    w, n = one(flag)
                    walls.append(round(w, 3))
                    ns.add(n)
                point[label] = {"median_s": sorted(walls)[len(walls) // 2], "runs": walls}
                point[f"{label}_rows"] = sorted(ns)
            assert point["bucketed_rows"] == point["plain_rows"], "layouts must agree on the result"
            point["rows_out"] = point.pop("bucketed_rows")[0]
            point.pop("plain_rows")
            point["bucketed_wins"] = point["bucketed"]["median_s"] < point["plain"]["median_s"]
            out["points"].append(point)
            cand_df.unpersist()
            shutil.rmtree(ckpt, ignore_errors=True)
        winners = [p["seen_rows"] for p in out["points"] if p["bucketed_wins"]]
        out["crossover_seen_rows"] = min(winners) if winners else None
    finally:
        spark.stop()
    return out


def _run_phase(args: list[str], pin_cores: int | None = None) -> dict:
    """Run one bench phase in a FRESH python subprocess (one SparkContext per
    process).  Sequential stop/start of SparkContexts inside one process
    leaves the JVM pointed at a dead Python accumulator server — every task
    completion then logs a DAGScheduler 'Failed to update accumulator ...
    EOF reached before Python server acknowledged' stack trace (thousands
    per run, polluting the recorded artifact and burning log IO).

    ``pin_cores``: CPU-affinity-pin the whole process tree (JVM + Python UDF
    workers) to that many cores.  local[N] only bounds JVM task slots —
    Python workers run outside the pool, so an unpinned "local[2]" run
    borrows extra host cores for its fetch/extract pipeline and understates
    scaling efficiency.  Pinning makes the N-vs-4N comparison a true
    cluster-size emulation (an N-core executor host has N cores for
    everything)."""
    import shutil as _shutil
    import subprocess

    cmd = [sys.executable, os.path.abspath(__file__), *args]
    if pin_cores and _shutil.which("taskset") and pin_cores < (os.cpu_count() or pin_cores):
        cmd = ["taskset", "-c", f"0-{pin_cores - 1}", *cmd]
    load_before = os.getloadavg()[0]
    busy_before = _box_busy_cpu_s()
    own_before = _children_cpu_s()
    wall_t0 = time.monotonic()
    # sample the 1-min load every 2 s WHILE the phase runs: the during-run
    # profile (not just the before/after endpoints) is what distinguishes an
    # external burst from our own pinned work — a phase pinned to N cores
    # whose mean load is far above N + its own runnable threads was sharing
    # the machine, and the gate below retries it.
    proc = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=sys.stderr, text=True)
    samples: list[float] = []
    tree_cpu: dict[int, float] = {}
    while proc.poll() is None:
        samples.append(os.getloadavg()[0])
        _sample_tree_cpu(proc.pid, tree_cpu)
        time.sleep(1.0)
    out, _ = proc.communicate()
    if proc.returncode != 0:
        raise RuntimeError(f"bench phase {args} exited {proc.returncode}")
    result = json.loads(out.strip().splitlines()[-1])
    # external-host-load evidence: this box runs processes outside the
    # sandbox's control and wall times drift 20-70% under their load —
    # recording the 1-min load around each phase makes any weak sample
    # self-evidencing (see BENCH.md variance notes)
    result["host_load_1m"] = {"before": round(load_before, 2), "after": round(os.getloadavg()[0], 2)}
    phase_wall = max(time.monotonic() - wall_t0, 0.001)
    # own CPU: two independent lower bounds — reaped-children rusage (exact
    # for whatever the phase waited) and the sampled /proc tree (covers the
    # JVM even when it is never reaped) — take the max
    own_rusage = _children_cpu_s() - own_before
    own_sampled = sum(tree_cpu.values())
    own_core_s = max(own_rusage, own_sampled)
    ext_core_s = max(0.0, (_box_busy_cpu_s() - busy_before) - own_core_s)
    result["external_cpu"] = {
        "external_core_s": round(ext_core_s, 1),
        "external_cores_avg": round(ext_core_s / phase_wall, 3),
        "own_core_s": round(own_core_s, 1),
        "own_rusage_core_s": round(own_rusage, 1),
        "own_sampled_core_s": round(own_sampled, 1),
        "phase_wall_s": round(phase_wall, 1),
    }
    if samples:
        result["host_load_during"] = {
            "mean": round(sum(samples) / len(samples), 2),
            "max": round(max(samples), 2),
            "n": len(samples),
        }
    return result


def _bandwidth_work(args: tuple) -> float:
    mb, reps = args
    import numpy as np

    n = mb * 1024 * 1024 // 8
    a = np.arange(n, dtype=np.float64)  # far beyond L3: streams from DRAM
    b = np.ones(n, dtype=np.float64)
    t0 = time.monotonic()
    for _ in range(reps):
        a += b  # read a + read b + write a = 3 streams
    return 3 * 8 * n * reps / (time.monotonic() - t0)


def bandwidth_probe(cores: int, mb_per_worker: int = 128, reps: int = 20) -> dict:
    """Memory-bandwidth control (late round 5): aggregate DRAM GB/s of a
    STREAM-style triad across ``cores`` workers.  The md5 ceiling control
    is ALU/cache-bound, so hypervisor co-tenants saturating the socket's
    memory bandwidth are invisible to it — measured on 2026-08-20: md5
    ceiling 0.95-1.05 while the SAME deterministic local[32] crawl ran 3.8x
    its quiet-host wall (BENCH_r05_allbases_rerun.json headline, round
    walls 20-30 s vs 4-5 s).  A shuffle-heavy engine is bandwidth-bound
    long before it is ALU-bound; this probe pins the host's delivered
    bandwidth next to every absolute number so that failure mode is
    diagnosable from the artifact alone."""
    import multiprocessing as mp

    with mp.Pool(cores) as pool:
        rates = pool.map(_bandwidth_work, [(mb_per_worker, reps)] * cores)
    mean = sum(rates) / len(rates)
    return {
        "cores": cores,
        "mb_per_worker": mb_per_worker,
        "agg_gb_per_sec": round(sum(rates) / 1e9, 2),
        "min_worker_gb_per_sec": round(min(rates) / 1e9, 2),
        # slowest worker vs mean: a barrier-style parallel job runs at the
        # STRAGGLER's speed, so this ratio — not the aggregate — predicts
        # Spark stage walls under hypervisor core-time-slicing (measured:
        # 0.69 at 32 workers while local[32] crawls ran 3x slow and a
        # local[16] probe was full-speed; 0.94 at 8 workers with healthy
        # pinned-8 walls in the same window)
        "straggler_ratio": round(min(rates) / mean, 3) if mean else None,
    }


def _control_work(n: int) -> int:
    import hashlib

    h = b"x" * 64
    for _ in range(n):
        h = hashlib.md5(h).digest()
    return h[0]


def control_bench(cores: int, total_ops: int = 24_000_000) -> dict:
    """Machine-ceiling control: the SAME fixed amount of pure-CPU work
    (md5 chains, zero IPC after the fork) split across ``cores``
    multiprocessing workers.  Run pinned at the scaling pair's core counts
    in the same window, its 2->8 efficiency is the HOST's parallel ceiling
    that day — engine efficiency cannot exceed it, and dividing by it
    attributes any shared-host degradation (SMT siblings, hypervisor
    frequency, memory bandwidth — none visible to loadavg or /proc steal)
    to the machine rather than the engine.  Mid-round-5 measurement: the
    same control that read 0.94 when the committed scaling run was recorded
    read 0.858 hours later on an idle box while engine scaling read 0.708."""
    import multiprocessing as mp

    per = total_ops // cores
    t0 = time.monotonic()
    with mp.Pool(cores) as pool:
        pool.map(_control_work, [per] * cores)
    wall = time.monotonic() - t0
    return {"wall_s": round(wall, 2), "ops": total_ops, "ops_per_sec": round(total_ops / wall, 0), "cores": cores}


def _box_busy_cpu_s() -> float:
    """Whole-box busy core-seconds since boot (/proc/stat line 1: everything
    except idle+iowait, so user/nice/system/irq/softirq/steal/guest)."""
    parts = open("/proc/stat").readline().split()
    v = list(map(int, parts[1:]))
    idle = v[3] + (v[4] if len(v) > 4 else 0)
    return (sum(v) - idle) / os.sysconf("SC_CLK_TCK")


def _children_cpu_s() -> float:
    """Cumulative CPU core-seconds of this process's reaped children.
    LOWER BOUND on a phase's own CPU: the gateway JVM is not always waited
    by the phase python, so its time can be missing here — the /proc tree
    sampling below covers it (the gate takes the max of both)."""
    import resource

    r = resource.getrusage(resource.RUSAGE_CHILDREN)
    return r.ru_utime + r.ru_stime


def _sample_tree_cpu(root_pid: int, cache: dict[int, float]) -> None:
    """Accumulate, per live descendant of ``root_pid`` (inclusive), the max
    cumulative CPU seconds observed in /proc/<pid>/stat.  Summed at phase
    end this is the phase's own CPU measured INDEPENDENTLY of wait()/reap
    semantics; it misses at most one sampling interval per process (the
    slice between the last sample and its exit)."""
    tick = os.sysconf("SC_CLK_TCK")
    info: dict[int, tuple[int, float]] = {}
    for p in os.listdir("/proc"):
        if not p.isdigit():
            continue
        try:
            with open(f"/proc/{p}/stat", "rb") as f:
                st = f.read().decode("ascii", "replace")
        except OSError:
            continue
        try:
            rp = st.rindex(")")
            fields = st[rp + 2 :].split()
            info[int(p)] = (int(fields[1]), (int(fields[11]) + int(fields[12])) / tick)
        except (ValueError, IndexError):  # pragma: no cover - racing exit
            continue
    kids: dict[int, list[int]] = {}
    for pid, (ppid, _) in info.items():
        kids.setdefault(ppid, []).append(pid)
    stack, seen = [root_pid], set()
    while stack:
        x = stack.pop()
        if x in seen:
            continue
        seen.add(x)
        stack.extend(kids.get(x, []))
    for pid in seen:
        if pid in info and info[pid][1] > cache.get(pid, 0.0):
            cache[pid] = info[pid][1]


def _wait_for_quiet(threshold: float, max_wait_s: float = LOAD_MAX_WAIT) -> dict:
    """Poll the 1-min load until it decays below ``threshold`` or the wait
    budget runs out (the 1-min EMA has a ~60 s time constant, so 150 s is
    enough to shed both our previous phase's load and a short external
    burst).  Returns a declaration of what happened for the artifact."""
    t0 = time.monotonic()
    first = os.getloadavg()[0]
    load = first
    while load > threshold and time.monotonic() - t0 < max_wait_s:
        time.sleep(5.0)
        load = os.getloadavg()[0]
    return {
        "threshold": round(threshold, 2),
        "load_start": round(first, 2),
        "load_end": round(load, 2),
        "waited_s": round(time.monotonic() - t0, 1),
        "quiet": load <= threshold,
    }


def _run_phase_gated(args: list[str], pin_cores: int | None, own_cores: int | None = None) -> dict:
    """Load-defended phase runner (VERDICT r4 #1): wait for a quiet window,
    run the phase while sampling host load, and retry (bounded) if the
    during-run mean load exceeds what the phase itself can generate plus
    BENCH_LOAD_SLACK.  Acceptance is on LOAD only — never on the measured
    throughput — so retries cannot tune the protocol toward a number; a
    clean first run costs nothing.  All attempts are declared under
    ``load_gate`` in the kept result."""
    if not LOAD_GATE_ON:
        return _run_phase(args, pin_cores=pin_cores)
    own = own_cores if own_cores is not None else (pin_cores or CPUS)
    # a pinned phase's own runnable threads can push loadavg somewhat above
    # its pin count (GC/compiler threads queue on the pinned cores), so the
    # acceptance threshold is own-cores + slack; the pre-wait threshold is
    # slack alone because nothing of ours should be running yet.
    accept_threshold = own + LOAD_SLACK
    attempts: list[dict] = []
    best: dict | None = None
    best_mean = float("inf")
    for i in range(LOAD_ATTEMPTS):
        wait = _wait_for_quiet(LOAD_SLACK)
        result = _run_phase(args, pin_cores=pin_cores)
        during = result.get("host_load_during", {})
        ext = result.get("external_cpu", {})
        ext_avg = ext.get("external_cores_avg", 0.0)
        mean = during.get("mean", 0.0)
        # primary acceptance: measured external CPU (exact, burst-proof);
        # the loadavg ceiling stays as a sanity backstop
        accepted = ext_avg <= EXT_CPU_LIMIT and mean <= accept_threshold
        attempts.append({
            "attempt": i + 1,
            "pre_wait": wait,
            "load_during": during,
            "external_cpu": ext,
            "accepted": accepted,
            "wall_s": result.get("wall_s"),
        })
        if ext_avg < best_mean:
            best, best_mean = result, ext_avg
        if accepted:
            break
    assert best is not None
    best["load_gate"] = {
        "accept_threshold": round(accept_threshold, 2),
        "slack": LOAD_SLACK,
        "ext_cpu_limit": EXT_CPU_LIMIT,
        "attempts": attempts,
        "accepted": attempts[-1]["accepted"],
        "kept": "first accepted attempt" if attempts[-1]["accepted"] else "lowest-external-cpu attempt",
    }
    return best


def main() -> None:
    sf = _sf()
    n_pages = int(os.environ.get("BENCH_CRAWL_PAGES", webgen.SF_PAGES.get(sf, int(2_000_000 * sf))))
    n_hosts = webgen.SF_HOSTS.get(sf, max(20, int(2_000 * sf)))

    total_t0 = time.monotonic()
    # The HEADLINE crawl runs FIRST: it is the bench's only ABSOLUTE
    # throughput number (everything after it — scaling, stateful — is a
    # RELATIVE pinned-pair ratio that cancels machine state).  Measured
    # evidence for the ordering: two full-sequence runs placed this phase
    # ~45 min in (after the queries sweep) and recorded 1,530 own-CPU
    # core-seconds for work that costs 1,020-1,040 fresh — identical
    # deterministic rounds burning ~50% more cycles with external CPU at
    # 0.1 cores, i.e. sustained-load frequency sag that no load/steal gate
    # can see.  Standalone probes of the same command reproduce 26 s
    # (5.8k URLs/s) on a fresh box.  Absolute numbers get the fresh box;
    # ratios keep their alternating-pair protection.
    #
    # Straggler pre-gate for the one UNPINNED absolute phase: when the
    # hypervisor time-slices a subset of the vCPUs, a barrier-style stage
    # runs at its slowest task's speed while loadavg/external-CPU/aggregate
    # bandwidth all read healthy (the diagnosed late-r5 episode: local[32]
    # 3x slow, local[16] full speed, straggler_ratio 0.64-0.76).  Probe the
    # per-worker spread and WAIT (bounded) for a healthy window; acceptance
    # is on the probe — host health measured independently of the phase —
    # never on the phase's own throughput.  All probes ride the artifact.
    straggler_min = float(os.environ.get("BENCH_STRAGGLER_MIN", "0.85"))
    straggler_probes: list[dict] = []
    for _ in range(LOAD_ATTEMPTS if LOAD_GATE_ON else 1):
        bw = bandwidth_probe(CPUS)
        straggler_probes.append(bw)
        ratio_ok = bw.get("straggler_ratio") is None or bw["straggler_ratio"] >= straggler_min
        if ratio_ok or not LOAD_GATE_ON:
            break
        time.sleep(min(60.0, LOAD_MAX_WAIT))
    high = _run_phase_gated(
        ["--phase", "crawl", "--cores", str(CPUS), "--pages", str(n_pages), "--hosts", str(n_hosts)],
        pin_cores=None,
        own_cores=CPUS,
    )
    high["straggler_gate"] = {
        "min_ratio": straggler_min,
        "probes": straggler_probes,
        "accepted": straggler_probes[-1].get("straggler_ratio") is None
        or straggler_probes[-1]["straggler_ratio"] >= straggler_min,
    }

    qres = _run_phase_gated(["--phase", "queries"], pin_cores=None, own_cores=CPUS)
    queries = qres["timings"]
    queries["crawl_sf_web"] = high["wall_s"]

    extras = {
        "crawl": {f"local{CPUS}": high},
        "crawl_urls_per_sec": high["urls_per_sec"],
        # delivered DRAM GB/s right after the absolute phase: a sagging
        # number here explains a sagging headline when loadavg/external-CPU
        # read clean (bandwidth co-tenancy; see bandwidth_probe)
        "headline_bandwidth": bandwidth_probe(CPUS),
        "query_stats": qres["stats"],
    }
    if not os.environ.get("BENCH_SKIP_SCALING"):
        # north_rule scaling evidence: SAME job, SAME input, N vs 4N cores.
        # local[2] vs local[8] stays well under the 32-core box's contention
        # knee (multiprocessing control measures ~0.94 machine ceiling there),
        # so the number reflects the ENGINE's scaling, not host throttling.
        #
        # Each run seeds SEED_ROUNDS unbilled bootstrap rounds (frontier
        # 200 -> ~115k URLs) and times the resumed remainder: at the
        # north_rule's 10^10-URL frontier every round is deep, so the
        # measured window IS the design-point steady state — whole-crawl
        # and deep-round efficiency coincide by construction instead of the
        # whole-crawl number being dragged by the core-count-independent
        # ~3 s/round fixed cost of the 2-3 tiny bootstrap rounds.
        scale_pages = int(os.environ.get("BENCH_SCALING_PAGES", "2000000"))
        scale_hosts = 200
        seed_rounds = int(os.environ.get("BENCH_SEED_ROUNDS", "3"))
        # UNCONDITIONAL repeated pairs in alternating order (hi,lo then
        # lo,hi): the same deterministic work runs twice per core count and
        # the efficiency is computed from SUMMED billed walls.  Round-4/5
        # evidence: with a clean load gate the 2-core wall is reproducible
        # within 1% across sessions while the 8-core wall swings ±18%
        # (single-sample host noise concentrates on the many-core side), so
        # doubling the sample and alternating order halves ratio noise and
        # cancels monotonic drift.  This is pre-registered protocol — the
        # repeat count never depends on any measured value.
        pairs = max(1, int(os.environ.get("BENCH_SCALING_REPEATS", "2")))
        lo_cores, hi_cores = 2, 8
        hi_runs: list[dict] = []
        lo_runs: list[dict] = []
        for p in range(pairs):
            order = [(hi_cores, hi_runs), (lo_cores, lo_runs)]
            if p % 2:
                order.reverse()
            for cores, bucket in order:
                bucket.append(
                    _run_phase_gated(
                        ["--phase", "crawl", "--cores", str(cores), "--pages", str(scale_pages),
                         "--hosts", str(scale_hosts), "--seed-rounds", str(seed_rounds),
                         "--bloom-min-seen", "10000"],
                        pin_cores=cores,
                    )
                )
        ratio = hi_cores / lo_cores

        # best-2-of-3 consistency vote (round-5): the pair runs are the SAME
        # deterministic work, so on a healthy host a bucket's two billed
        # walls agree within a few percent (measured: 2-core within 1%
        # across sessions; a clean 8-core pair within 0.2%).  When they
        # diverge beyond BENCH_CONSISTENCY_TOL one sample is contaminated by
        # host state no load/steal/external-CPU gate can see (frequency sag,
        # bandwidth co-tenancy) — but with two samples the outlier is
        # unidentifiable, so the rule runs ONE tie-breaker and keeps the two
        # most mutually consistent runs.  Direction-neutral by construction:
        # if the tie-breaker lands slow, the fast sample is the one
        # discarded — a majority vote on the true cost, never a retry-until-
        # fast loop.  Every raw run stays in the artifact.
        consistency_tol = float(os.environ.get("BENCH_CONSISTENCY_TOL", "1.15"))
        consistency: list[dict] = []

        def _consistency_vote(cores: int, bucket: list[dict], phase_args: list[str]) -> None:
            if len(bucket) != 2 or not LOAD_GATE_ON:
                return
            walls = [r["billed_wall_s"] for r in bucket]
            if min(walls) <= 0 or max(walls) / min(walls) <= consistency_tol:
                return
            tiebreak = _run_phase_gated(phase_args, pin_cores=cores)
            cands = bucket + [tiebreak]
            best_pair, best_div = (0, 1), float("inf")
            for a in range(3):
                for b in range(a + 1, 3):
                    wa, wb = cands[a]["billed_wall_s"], cands[b]["billed_wall_s"]
                    div = max(wa, wb) / min(wa, wb) if min(wa, wb) > 0 else float("inf")
                    if div < best_div:
                        best_pair, best_div = (a, b), div
            dropped = ({0, 1, 2} - set(best_pair)).pop()
            consistency.append({
                "cores": cores,
                "raw_billed_walls": [round(c["billed_wall_s"], 2) for c in cands],
                "kept": sorted(best_pair),
                "dropped_billed_wall_s": round(cands[dropped]["billed_wall_s"], 2),
                "kept_divergence": round(best_div, 3),
                "tol": consistency_tol,
            })
            bucket[:] = [cands[best_pair[0]], cands[best_pair[1]]]

        scale_args = lambda cores: [  # noqa: E731 - tiny arg template
            "--phase", "crawl", "--cores", str(cores), "--pages", str(scale_pages),
            "--hosts", str(scale_hosts), "--seed-rounds", str(seed_rounds),
            "--bloom-min-seen", "10000",
        ]
        _consistency_vote(hi_cores, hi_runs, scale_args(hi_cores))
        _consistency_vote(lo_cores, lo_runs, scale_args(lo_cores))

        def _sum_rate(runs: list[dict], wall_key: str, fetched_key: str) -> float:
            wall = sum(r[wall_key] for r in runs)
            return sum(r[fetched_key] for r in runs) / wall if wall > 0 else 0.0

        def _eff(wall_key: str, fetched_key: str) -> float:
            lo_rate = _sum_rate(lo_runs, wall_key, fetched_key)
            return (_sum_rate(hi_runs, wall_key, fetched_key) / lo_rate) / ratio if lo_rate else 0.0

        raw_eff = _eff("wall_s", "fetched")
        deep_eff = _eff("deep_wall_s", "deep_fetched")
        billed_eff = _eff("billed_wall_s", "billed_fetched")
        hi = {  # aggregate view (per-run detail is in the *_runs lists)
            "billed_urls_per_sec": round(_sum_rate(hi_runs, "billed_wall_s", "billed_fetched"), 2),
            "urls_per_sec": round(_sum_rate(hi_runs, "wall_s", "fetched"), 2),
            "deep_urls_per_sec": round(_sum_rate(hi_runs, "deep_wall_s", "deep_fetched"), 2),
            "tail_rounds_unbilled": sum(r["tail_rounds_unbilled"] for r in hi_runs),
        }
        lo = {
            "billed_urls_per_sec": round(_sum_rate(lo_runs, "billed_wall_s", "billed_fetched"), 2),
            "urls_per_sec": round(_sum_rate(lo_runs, "wall_s", "fetched"), 2),
            "deep_urls_per_sec": round(_sum_rate(lo_runs, "deep_wall_s", "deep_fetched"), 2),
            "tail_rounds_unbilled": sum(r["tail_rounds_unbilled"] for r in lo_runs),
        }
        per_pair_eff = [
            round(
                (h["billed_urls_per_sec"] / l["billed_urls_per_sec"]) / ratio
                if l["billed_urls_per_sec"]
                else 0.0,
                3,
            )
            for h, l in zip(hi_runs, lo_runs)
        ]
        extras["crawl"][f"scaling_local{lo_cores}_runs"] = lo_runs
        extras["crawl"][f"scaling_local{hi_cores}_runs"] = hi_runs
        # stateful-streaming politeness operator at both core counts
        # (VERDICT r3 item 8): rows/s through applyInPandasWithState —
        # same repeated alternating-pair protocol as the crawl scaling
        st_hi_runs: list[dict] = []
        st_lo_runs: list[dict] = []
        for p in range(pairs):
            st_order = [(hi_cores, st_hi_runs), (lo_cores, st_lo_runs)]
            if p % 2:
                st_order.reverse()
            st_rows = os.environ.get("BENCH_STATEFUL_ROWS", "2000000")
            for cores, bucket in st_order:
                bucket.append(
                    _run_phase_gated(
                        ["--phase", "stateful", "--cores", str(cores), "--rows", st_rows],
                        pin_cores=cores,
                    )
                )
        # bucketed-vs-plain seen anti-join at the 10^10 shape (VERDICT r4 #3):
        # where does the exchange-free bucketed path start to win, and by how
        # much where it matters
        sj = _run_phase_gated(["--phase", "seenjoin", "--cores", str(hi_cores)], pin_cores=hi_cores)
        extras["seenjoin"] = sj

        def _st_rate(runs: list[dict], wall_key: str) -> float:
            wall = sum(r[wall_key] for r in runs)
            return sum(r["rows"] for r in runs) / wall if wall > 0 else 0.0

        st_lo = {
            "rows_per_sec": round(_st_rate(st_lo_runs, "data_batch_s"), 2),
            "whole_query_rows_per_sec": round(_st_rate(st_lo_runs, "wall_s"), 2),
        }
        st_hi = {
            "rows_per_sec": round(_st_rate(st_hi_runs, "data_batch_s"), 2),
            "whole_query_rows_per_sec": round(_st_rate(st_hi_runs, "wall_s"), 2),
        }
        st_eff = (st_hi["rows_per_sec"] / st_lo["rows_per_sec"]) / ratio if st_lo["rows_per_sec"] else 0.0
        st_wq_eff = (
            (st_hi["whole_query_rows_per_sec"] / st_lo["whole_query_rows_per_sec"]) / ratio
            if st_lo["whole_query_rows_per_sec"]
            else 0.0
        )
        extras["stateful"] = {
            "low": st_lo,
            "high": st_hi,
            "low_runs": st_lo_runs,
            "high_runs": st_hi_runs,
            "pairs": pairs,
            "efficiency": round(st_eff, 3),
            "efficiency_basis": "data micro-batch triggerExecution time, summed over repeated pairs",
            "whole_query_efficiency": round(st_wq_eff, 3),
        }
        # Runs are CPU-affinity-pinned to N cores so JVM + Python workers
        # together see exactly the emulated cluster size.
        extras["scaling"] = {
            "low_cores": lo_cores,
            "high_cores": hi_cores,
            "pages": scale_pages,
            "cpu_pinned": True,
            "pairs": pairs,
            "pair_order": "alternating (hi,lo / lo,hi) — cancels monotonic host drift",
            "per_pair_efficiency": per_pair_eff,
            # best-2-of-3 votes that fired (empty list = every bucket's two
            # runs agreed within tol on the first try); raw walls of ALL
            # runs incl. the dropped one are declared here
            "consistency": consistency,
            "consistency_tol": consistency_tol,
            "aggregation": "rates from SUMMED walls and fetched counts across all runs per core count",
            "seed_rounds_unbilled": seed_rounds,
            "protocol": (
                "deep-frontier measured window: each run grows the frontier for "
                f"{seed_rounds} unbilled rounds, then times the resumed remainder; "
                "the sub-deep drain/stop SUFFIX is excluded symmetrically and "
                "declared per-run (tail_rounds_unbilled/tail_selected/tail_wall_s) "
                "— identical deterministic work at both core counts"
            ),
            # raw whole-window rates under the round-1/2 key names (ADVICE r4:
            # reusing them for the billed rate silently changed metric
            # semantics across rounds); the billed rate has its own keys.
            "urls_per_sec_low": lo["urls_per_sec"],
            "urls_per_sec_high": hi["urls_per_sec"],
            "billed_urls_per_sec_low": lo["billed_urls_per_sec"],
            "billed_urls_per_sec_high": hi["billed_urls_per_sec"],
            "efficiency": round(deep_eff, 3),
            "efficiency_basis": "deep rounds of the measured window",
            "whole_crawl_efficiency": round(billed_eff, 3),
            "whole_crawl_basis": (
                "ALL billed-window rounds (measured window minus the declared "
                "sub-deep drain/stop suffix)"
            ),
            "all_rounds_efficiency": round(raw_eff, 3),
            "all_rounds_basis": "every measured-window round incl. the drain/stop tail",
            "tail_rounds_unbilled_low": lo["tail_rounds_unbilled"],
            "tail_rounds_unbilled_high": hi["tail_rounds_unbilled"],
            "deep_urls_per_sec_low": lo["deep_urls_per_sec"],
            "deep_urls_per_sec_high": hi["deep_urls_per_sec"],
        }
        # same-window machine-ceiling control (pure-CPU multiprocessing at
        # the same pinned core counts): the host's own 2->8 parallel
        # efficiency bounds anything the engine can show that day, and the
        # ceiling-normalized number attributes shared-host degradation
        # (invisible to the load/external-CPU gates) to the machine
        # Same repeated alternating-pair protocol as the engine ratios: a
        # single lo/hi control sample proved fragile (one artifact measured
        # ceiling 1.426 — a pinned embarrassingly-parallel CPU loop cannot
        # truly scale super-linearly, so that is pure sample noise, and
        # normalizing by it silently punished the engine number).
        ctl_lo_runs: list[dict] = []
        ctl_hi_runs: list[dict] = []
        for p in range(pairs):
            ctl_order = [(hi_cores, ctl_hi_runs), (lo_cores, ctl_lo_runs)]
            if p % 2:
                ctl_order.reverse()
            for cores, bucket in ctl_order:
                bucket.append(_run_phase(["--phase", "control", "--cores", str(cores)], pin_cores=cores))

        def _ctl_rate(runs: list[dict]) -> float:
            wall = sum(r["wall_s"] for r in runs)
            return sum(r["ops"] for r in runs) / wall if wall > 0 else 0.0

        ceiling_raw = (_ctl_rate(ctl_hi_runs) / _ctl_rate(ctl_lo_runs)) / ratio if _ctl_rate(ctl_lo_runs) else 0.0
        # the ceiling is definitionally <= 1.0; clamp the NORMALIZATION
        # divisor and keep the raw measurement disclosed alongside
        ceiling = min(1.0, ceiling_raw)
        extras["scaling"]["machine_ceiling_efficiency"] = round(ceiling_raw, 3)
        extras["scaling"]["ceiling_normalized_efficiency"] = (
            round(billed_eff / ceiling, 3) if ceiling else None
        )
        extras["scaling"]["ceiling_norm_divisor"] = round(ceiling, 3)
        extras["scaling"]["control"] = {"low_runs": ctl_lo_runs, "high_runs": ctl_hi_runs, "pairs": pairs}
        # delivered-DRAM-bandwidth control in the same window (the md5
        # ceiling is blind to bandwidth co-tenancy; see bandwidth_probe)
        extras["scaling"]["bandwidth"] = {
            "low": bandwidth_probe(lo_cores),
            "high": bandwidth_probe(hi_cores),
            "full": bandwidth_probe(CPUS),
        }

    total = round(time.monotonic() - total_t0, 2)
    # COMPACT one-line contract on stdout (the driver's capture window is
    # finite — round 3's artifact was truncated into unparseability); the
    # bulky evidence (per-run round walls, query min/max/runs, crawl
    # sub-results) goes to BENCH_full.json alongside.
    line = {
        "metric": "crawl+query wall seconds (headline: URLs fetched+deduped/sec)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "crawl_urls_per_sec": extras["crawl_urls_per_sec"],
        "full_artifact": "BENCH_full.json",
    }
    if "stateful" in extras:
        line["stateful_rows_per_sec"] = {
            "low": extras["stateful"]["low"]["rows_per_sec"],
            "high": extras["stateful"]["high"]["rows_per_sec"],
            "efficiency": extras["stateful"]["efficiency"],
        }
    if "seenjoin" in extras:
        line["seenjoin"] = {
            "crossover_seen_rows": extras["seenjoin"].get("crossover_seen_rows"),
            "points": [
                {
                    "seen_rows": p["seen_rows"],
                    "bucketed_s": p["bucketed"]["median_s"],
                    "plain_s": p["plain"]["median_s"],
                }
                for p in extras["seenjoin"]["points"]
            ],
        }
    if "scaling" in extras:
        s = extras["scaling"]
        # numbers only — the basis/protocol prose is in BENCH_full.json
        line["scaling"] = {
            k: s[k]
            for k in (
                "low_cores", "high_cores", "pages", "cpu_pinned", "seed_rounds_unbilled",
                "pairs", "per_pair_efficiency", "consistency", "consistency_tol",
                "urls_per_sec_low", "urls_per_sec_high",
                "billed_urls_per_sec_low", "billed_urls_per_sec_high",
                "efficiency", "whole_crawl_efficiency", "all_rounds_efficiency",
                "tail_rounds_unbilled_low", "tail_rounds_unbilled_high",
                "machine_ceiling_efficiency", "ceiling_normalized_efficiency",
            )
            if k in s
        }
        # one-glance load-gate evidence for the compact artifact: per gated
        # run, was the kept attempt load-clean and how many attempts it took
        def _gate_summary(res: dict) -> dict:
            return {
                "accepted": res.get("load_gate", {}).get("accepted"),
                "attempts": len(res.get("load_gate", {}).get("attempts", [])),
                "load_during_mean": res.get("host_load_during", {}).get("mean"),
                "external_cores_avg": res.get("external_cpu", {}).get("external_cores_avg"),
            }

        line["load_gate"] = {"crawl_headline": _gate_summary(high)}
        for i, (hr, lr) in enumerate(zip(hi_runs, lo_runs)):
            line["load_gate"][f"scaling_high_{i}"] = _gate_summary(hr)
            line["load_gate"][f"scaling_low_{i}"] = _gate_summary(lr)
        for i, (hr, lr) in enumerate(zip(st_hi_runs, st_lo_runs)):
            line["load_gate"][f"stateful_high_{i}"] = _gate_summary(hr)
            line["load_gate"][f"stateful_low_{i}"] = _gate_summary(lr)
    # skip-scaling iterations must not clobber the committed full artifact
    # (its scaling evidence is the round's gate) — park them in BENCH_quick
    full_name = "BENCH_full.json" if "scaling" in extras else "BENCH_quick.json"
    line["full_artifact"] = full_name
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), full_name)
    with open(full_path, "w") as fh:
        json.dump({**line, "extras": extras}, fh, indent=1)
    print(json.dumps(line))


if __name__ == "__main__":
    if "--phase" in sys.argv:
        phase = sys.argv[sys.argv.index("--phase") + 1]

        def _arg(name: str, default: int) -> int:
            return int(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default

        if phase == "queries":
            print(json.dumps(query_bench()))
        elif phase == "control":
            print(json.dumps(control_bench(_arg("--cores", 2), _arg("--ops", 24_000_000))))
        elif phase == "bandwidth":
            print(json.dumps(bandwidth_probe(_arg("--cores", CPUS))))
        elif phase == "seenjoin":
            print(json.dumps(seenjoin_bench(_arg("--cores", 8), cand=_arg("--cand", 100_000))))
        elif phase == "stateful":
            print(json.dumps(stateful_bench(_arg("--cores", CPUS), _arg("--rows", 2_000_000), _arg("--hosts", 20_000))))
        elif phase == "crawl":
            print(
                json.dumps(
                    crawl_bench(
                        _arg("--cores", CPUS),
                        _arg("--pages", 200_000),
                        _arg("--hosts", 200),
                        seed_rounds=_arg("--seed-rounds", 0),
                        bloom_min_seen=(
                            _arg("--bloom-min-seen", 0) or None
                        ),
                    )
                )
            )
        else:
            raise SystemExit(f"unknown phase {phase!r}")
    else:
        main()

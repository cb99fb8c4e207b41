"""The crawl engine: BFS micro-batch round loop with checkpoint/resume.

Spark rebuild of the reference's Scrapy engine loop (SURVEY.md §3.1):
each round is one micro-batch over the frontier —

  frontier -> politeness budget selection (P1) -> simulated fetch join
  against the pages table (J4; a real deployment swaps in a mapInArrow HTTP
  client per partition, S4) -> Arrow-UDF extraction (X1-X18) -> link
  discovery (F1) -> admission filters + dedup (F2-F7) -> global FIFO seq
  assignment (O1) -> frontier/seen checkpoint (T1) -> metrics (A7).

Round state lives in parquet round-directories committed by manifest
(storage.tables.CheckpointStore) so a killed run resumes from the last
committed round with an identical visited-URL set (north_rule).

Politeness: per-host budget = floor(round_seconds / crawl_delay).  When the
bucket capacity equals the round length this is the exact token-bucket
steady state (see politeness.static_budgets); a dynamic token-bucket path
(politeness.refill_tokens/spend_tokens) exists for burst capacities.

Scale notes (10^10 frontier design point):
  * no driver-side URL collections — only counts, offsets, and Bloom bitmaps
    cross the driver;
  * the pages side of the fetch join is repartitioned once on url_canon and
    persisted, so each round shuffles only the (politeness-bounded) fetch
    batch;
  * per-host selection is salt-parallel on hot hosts
    (politeness.select_per_host_static);
  * per-round lineage is cut by the parquet frontier checkpoint; the seen
    set is kept as an incrementally-persisted union whose durable copy is
    the per-round seen-delta parquet.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..functions import udfs
from ..storage.tables import CheckpointStore
from . import politeness
from .bloom import PartitionedBloom, merge_bitmaps_into
from .frontier import (
    apply_admission_filters,
    apply_robots_filter,
    dedup_against_seen,
    dedup_first_in_batch,
)
from .reference_bfs import CrawlPolicy
from .seqno import (
    SMALL_BATCH_THRESHOLD,
    assign_global_seq,
    assign_seq_bucketed,
    assign_seq_small,
    monotone_bucket,
)

FRONTIER_COLS = ["url_canon", "url_hash", "host", "depth", "seq", "source_url"]
SEEN_COLS = ["url_hash", "url_canon", "depth", "seq"]


@dataclass
class CrawlRun:
    checkpoint: CheckpointStore
    rounds: int = 0
    metrics: list[dict] = field(default_factory=list)

    def documents(self, spark: SparkSession) -> DataFrame | None:
        return self.checkpoint.read_documents(spark)

    def seen(self, spark: SparkSession) -> DataFrame | None:
        last = self.checkpoint.last_committed()
        return None if last is None else self.checkpoint.read_seen(spark, last)

    def total_fetched(self) -> int:
        return sum(m.get("fetched", 0) for m in self.metrics)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        pages: DataFrame | None,
        robots: DataFrame | None,
        policy: CrawlPolicy,
        checkpoint_dir: str,
        fetcher=None,
        round_seconds: float = 3600.0,
        bloom_shards: int = 16,
        bloom_bits: int = 1 << 20,
        bloom_min_seen: int = 500_000,
        fetch_partitions: int | None = None,
        hot_host_threshold: int = 200_000,
        bucketed_min_seen: int = 4_000_000,
        auto_compact_deltas: int | None = 64,
    ):
        self.spark = spark
        self.policy = policy
        self.store = CheckpointStore(checkpoint_dir)
        self.round_seconds = round_seconds
        self.default_budget = max(1, int(round_seconds / politeness.DEFAULT_CRAWL_DELAY))
        self.bloom_shards = bloom_shards
        self.bloom_bits = bloom_bits
        self.bloom_min_seen = bloom_min_seen
        self._bloom_built = False
        self._seen_bucketed = None  # set per run() from the checkpoint layout
        # Crossover for consuming a compacted seen set via the bucketed scan
        # vs. as plain parquet: below ~4M rows the plain side fits Spark's
        # broadcast/cheap-shuffle regime (autoBroadcastJoinThreshold=64m) and
        # the bucketed SMJ's per-round candidate sort costs more than the
        # shuffle it avoids; above it the plain path re-shuffles the whole
        # seen set every round while the bucketed scan is exchange-free.
        # Measured on this box (bench.py --phase seenjoin, local[8], 100k
        # candidates): 2M seen -> bucketed 2.2 s vs plain 1.9 s; 4M -> 0.60
        # vs 0.92; 8M -> 0.72 vs 1.11.  At the 10^10 design point the
        # bucketed path is always on; the threshold only protects small
        # crawls from paying SMJ overhead they don't need.
        self.bucketed_min_seen = bucketed_min_seen
        # Auto-compaction (T2): once this many seen-delta directories have
        # accumulated since the last compaction, the engine compacts them
        # into the bucketed seed table between rounds (the maintenance
        # window).  Bounds small-file growth over unbounded crawls — at one
        # delta dir per round a month-long crawl would otherwise union
        # thousands of parquet paths into every dedup anti-join.  None
        # disables (compaction stays manual, as before round 5).
        self.auto_compact_deltas = auto_compact_deltas
        self.compactions: list[dict] = []
        self.hot_host_threshold = hot_host_threshold
        self.fetch_partitions = fetch_partitions or max(32, spark.sparkContext.defaultParallelism)
        # robots/budgets are host-table-sized dimensions, but typically
        # arrive as a createDataFrame spread over defaultParallelism
        # partitions — every ROUND's broadcast build then runs one tiny
        # task per partition (r06: 32 scheduled tasks per broadcast to read
        # a few hundred rows).  Coalesce once at init; the per-round
        # broadcast job becomes a single task.
        self.robots = robots.coalesce(1).persist() if robots is not None else None
        self.budgets = politeness.static_budgets(self.robots, round_seconds)
        self.min_budget = self.default_budget
        if self.budgets is not None:
            self.budgets = self.budgets.coalesce(1).persist()
            rows = self.budgets.agg(F.min("budget").alias("m")).collect()
            if rows and rows[0]["m"] is not None:
                self.min_budget = min(self.min_budget, int(rows[0]["m"]))
        # pluggable fetch stage (S4/J4) — table join by default, batch-client
        # (GeneratorFetcher / HTTP) when supplied
        if fetcher is not None:
            self.fetcher = fetcher
        else:
            from .fetch import TableFetcher

            self.fetcher = TableFetcher(pages, self.fetch_partitions)

    # -- bootstrap -------------------------------------------------------------
    def _bootstrap(self, start_urls: list[str]) -> DataFrame:
        """Admit the seed URLs (depth 0, FIFO = listing order).

        Seeds bypass the query-string filter, jsessionid rewrite and deny
        paths (reference: start requests carry dont_filter=True and skip
        get_processed_request, middlewares.py:114-115); only the offsite,
        depth and robots checks apply.
        """
        seeds = self.spark.createDataFrame(
            [(u, 0, "", i) for i, u in enumerate(start_urls)],
            "url string, depth int, source_url string, pos int",
        )
        admitted = apply_admission_filters(seeds, self.policy, is_seed=True)
        admitted = apply_robots_filter(admitted, self.robots)
        admitted = dedup_first_in_batch(admitted, ["pos"])
        admitted, _, _h = assign_global_seq(admitted, ["pos"], start=0)
        return admitted.select(*FRONTIER_COLS)

    # -- one round ---------------------------------------------------------------
    def _run_round(
        self,
        rnd: int,
        frontier: DataFrame,
        seen: DataFrame,
        bloom: PartitionedBloom,
        next_seq: int,
        frontier_hint: int = 0,
    ) -> tuple[dict, DataFrame]:
        t0 = time.monotonic()
        timings: dict[str, float] = {}
        _last = [t0]

        def mark(name: str) -> None:
            now = time.monotonic()
            timings[name] = round(now - _last[0], 3)
            _last[0] = now

        # politeness-capped FIFO selection (static budgets; see module doc).
        # Fast path: when the whole frontier is within every host's budget the
        # cap cannot bind — selection is the identity and the per-host window
        # shuffle (and the frontier anti-join below) are skipped entirely.
        budget_binds = frontier_hint > self.min_budget
        if budget_binds:
            salt = 8 if frontier_hint > self.hot_host_threshold else 1
            selected = politeness.select_per_host_static(
                frontier, self.budgets, self.default_budget, salt_buckets=salt
            ).persist()
        else:
            selected = frontier

        # fetch (S4/J4) + extraction (X1-X18).  The batch is explicitly
        # repartitioned on url_hash first (north_rule: salt the frontier by
        # host/url hash) — the rows are tiny pre-fetch, and without this the
        # narrow fetch+extract chain would inherit the frontier parquet's
        # coalesced (often single) partition and serialize the hot path.
        # Partition count adapts to the batch (~2k pages/task): small rounds
        # avoid per-task Arrow-worker overhead, big rounds use every core.
        cores = self.spark.sparkContext.defaultParallelism
        parts = min(self.fetch_partitions, max(cores, (frontier_hint // 2000) + 1))
        # NO observe on `selected`: it sits UPSTREAM of the persisted
        # `extracted`, so both the documents query and the frontier query
        # would carry the same observation node — under concurrent execution
        # whichever query serves from cache reports an empty observation row
        # (toPyRow assertion).  n_selected is derived instead: the frontier
        # hint in the fast path (selection is the identity), a cached count
        # in the binding path.
        batch = selected.repartition(parts, F.col("url_hash"))
        fetched = self.fetcher.fetch(batch)
        found = fetched.filter(F.col("html").isNotNull())
        extracted = (
            found.withColumn("doc", udfs.extract_doc_links(F.col("html"), F.col("url_canon"), F.col("lang")))
            .select(
                "url_canon", "url_hash", "host", "depth", "seq", "source_url",
                F.length(F.col("html")).alias("download_bytes"),
                "doc", F.col("doc.links").alias("links"),
            )
            .persist()
        )
        # full reference document schema (indexing/transform.py:20-101):
        # created_at/updated_at use null instead of the reference's wall-clock
        # fallback (X18 nondeterminism exclusion); download_milliseconds and
        # creator are runtime placeholders upstream too.
        # r06: doc_id + url parts + BOTH date parses in one fused Arrow UDF
        # (doc_meta) — the previous projection paid five ArrowEvalPython
        # evaluations per round (parse_dates ran twice on created_raw alone);
        # 'updated' reuses the struct's created_at, evaluated once.
        meta = udfs.doc_meta(
            F.col("url_canon"), F.col("doc.created_raw"), F.col("doc.changed_raw")
        )
        documents = extracted.withColumn("_m", meta).select(
            F.col("_m.id").alias("id"),
            F.col("url_canon").alias("url"),
            F.col("url_canon").alias("path"),
            F.col("source_url"),
            F.col("_m.domain_name").alias("domain_name"),
            F.col("_m.basename").alias("basename"),
            F.nullif(F.col("_m.extension"), F.lit("")).alias("extension"),
            F.col("_m.url_path").alias("url_path"),
            F.col("depth").alias("crawl_depth"),
            F.col("seq"),
            F.col("doc.title").alias("title"),
            F.col("doc.description").alias("description"),
            F.col("doc.keywords").alias("keywords"),
            F.col("doc.keywords").alias("tags"),
            F.col("doc.language").alias("language"),
            F.col("doc.content").alias("content"),
            F.nullif(F.col("doc.audience"), F.lit("")).alias("audience"),
            F.nullif(F.col("doc.thumbnail_url"), F.lit("")).alias("thumbnail_url"),
            F.col("_m.created_at").alias("created_at"),
            F.col("_m.changed").alias("changed"),
            F.col("_m.created_at").alias("updated"),
            F.lit("text/html").alias("mime_type"),
            F.lit("article").alias("content_type"),
            F.lit(None).cast("long").alias("dap_domain_visits_count"),
            F.struct(
                F.col("depth").alias("crawl_depth"),
                F.lit(None).cast("string").alias("creator"),
                F.col("download_bytes").alias("download_bytes"),
                F.lit(None).cast("long").alias("download_milliseconds"),
                F.col("source_url").alias("source_url"),
            ).alias("metadata"),
        )
        if frontier_hint == 0:
            # empty frontier (resume edge): nothing to fetch this round —
            # checkpoint an unchanged frontier so the round commits.
            # (Selection is the identity on a non-empty frontier, so
            # n_selected == 0 iff the frontier is empty — gate on the exact
            # hint BEFORE launching any job.)
            remaining = frontier.count()
            extracted.unpersist()
            metrics = {
                "selected": 0, "fetched": 0, "missed": 0, "admitted": 0,
                "remaining": remaining, "next_seq": next_seq,
                "round_wall_s": round(time.monotonic() - t0, 3),
                "timings": timings, "stop": remaining == 0,
            }
            self.store.write_table(frontier, rnd, "frontier")
            self.store.write_seen_delta(seen.limit(0), rnd)
            return metrics, seen

        # documents write runs CONCURRENTLY with the admission/frontier job
        # (separate driver thread; Spark schedules both jobs at once).  Both
        # consume the persisted `extracted`; the block manager's per-block
        # locking makes concurrent materialization safe.  This hides one of
        # the round's two action latencies — the dominant share of the
        # small-round fixed cost.
        obs_docs = Observation()
        docs_df = documents.observe(obs_docs, F.count(F.lit(1)).alias("n"))
        docs_err: list[BaseException] = []

        def _write_docs() -> None:
            try:
                self.store.write_table(docs_df, rnd, "documents")
            except BaseException as exc:  # re-raised on the round thread
                docs_err.append(exc)

        docs_thread = threading.Thread(target=_write_docs, name=f"docs-write-{rnd}", daemon=True)
        docs_thread.start()

        # discovery (F1) -> admission (F2-F6) -> dedup (F7) -> FIFO seq (O1)
        discovered = extracted.select(
            F.col("url_canon").alias("source_url"),
            F.col("depth").alias("parent_depth"),
            F.col("seq").alias("parent_seq"),
            F.posexplode_outer(F.col("links")).alias("pos", "url"),
        ).filter(F.col("url").isNotNull())
        candidates = apply_admission_filters(
            discovered.withColumn("depth", F.col("parent_depth") + 1).drop("parent_depth"),
            self.policy,
        )
        candidates = apply_robots_filter(candidates, self.robots)
        candidates = dedup_first_in_batch(candidates, ["parent_seq", "pos"]).persist()
        # Bloom prefiltering pays once the seen set is large (the anti-join
        # shuffle it avoids outweighs the probe); below the threshold the
        # plain anti-join is cheaper.  next_seq == |seen| by construction.
        # On first crossing, the filter is (re)built COMPLETE from the full
        # seen set — a Bloom with missing members would admit duplicates.
        use_bloom = next_seq >= self.bloom_min_seen
        if use_bloom and not self._bloom_built:
            # the bloom must cover the FULL seen set (bucketed + deltas)
            seen_full = (
                self._seen_bucketed.select(*SEEN_COLS).unionByName(seen)
                if self._seen_bucketed is not None
                else seen
            )
            # rows_hint = |seen| lets the build pick the shuffle-by-shard
            # topology once the seen set is big enough that direct task
            # emissions would flood the driver (merge_bitmaps_into docstring)
            merge_bitmaps_into(bloom, seen_full, "url_hash", rows_hint=next_seq)
            self._bloom_built = True
        new_admits = dedup_against_seen(
            self.spark, candidates, seen, bloom if use_bloom else None,
            seen_bucketed=self._seen_bucketed,
        )
        # FIFO sequence: small batches (estimated from fan-out) avoid the
        # pre-count pass; the exact count comes from the write Observation.
        # (n_selected <= frontier_hint, so hint * fan-out bounds the batch.)
        # Big batches take the SAMPLING-FREE bucketed scheme: the frontier's
        # seqs are exactly [next_seq - |frontier|, next_seq) in the fast
        # path, so a monotone bucket id is pure arithmetic on parent_seq —
        # no range-partitioner sampling job, no pre-count job, no second
        # shuffled cache.  (Out-of-range parents on the budget-binding path
        # clamp to the end buckets; monotonicity — correctness — holds for
        # any bounds, per seqno.monotone_bucket.)
        est_admits = frontier_hint * 8
        seq_cache = None
        if est_admits < SMALL_BATCH_THRESHOLD:
            new_admits = assign_seq_small(new_admits, ["parent_seq", "pos"], start=next_seq)
        else:
            n_buckets = max(4 * self.spark.sparkContext.defaultParallelism, 8)
            pid = monotone_bucket(
                F.col("parent_seq"), lo=next_seq - frontier_hint, span=frontier_hint,
                n_buckets=n_buckets,
            )
            new_admits, _, seq_cache = assign_seq_bucketed(
                new_admits.withColumn("_pid", pid), ["parent_seq", "pos"], start=next_seq
            )
        new_admits = new_admits.persist()
        # Incremental Bloom fold OVERLAPPED with the frontier/documents
        # writes: it reads only url_hash from the already-materialized
        # pre-window cache (seqs are irrelevant to membership), so it shares
        # no lineage with the writes.  The join before this round returns
        # keeps the probe-ordering invariant: round n+1's prefilter never
        # runs before round n's admits are folded in.
        bloom_err: list[BaseException] = []
        bloom_thread: threading.Thread | None = None
        if self._bloom_built and frontier_hint > 0:
            bloom_src = seq_cache if seq_cache is not None else new_admits

            def _merge_bloom() -> None:
                try:
                    merge_bitmaps_into(bloom, bloom_src, "url_hash")
                except BaseException as exc:  # re-raised on the round thread
                    bloom_err.append(exc)

            bloom_thread = threading.Thread(target=_merge_bloom, name=f"bloom-merge-{rnd}", daemon=True)
            bloom_thread.start()
        mark("admission_plan")

        # state transition + checkpoint.  Fast path: everything in the
        # frontier was selected, so the next frontier is just the new admits.
        obs_adm = Observation()
        admits_obs = new_admits.observe(obs_adm, F.count(F.lit(1)).alias("n")).select(*FRONTIER_COLS)
        if budget_binds:
            frontier_next = (
                frontier.join(selected.select("seq"), "seq", "left_anti")
                .select(*FRONTIER_COLS)
                .unionByName(admits_obs)
            )
        else:
            frontier_next = admits_obs
        obs_frontier = Observation()
        t_fw = time.monotonic()
        try:
            self.store.write_table(
                frontier_next.observe(obs_frontier, F.count(F.lit(1)).alias("n")), rnd, "frontier"
            )
            timings["frontier_parquet"] = round(time.monotonic() - t_fw, 3)
        finally:
            # ALWAYS re-join the concurrent writes/folds — if the frontier
            # write raised, the side threads' own failures must not be
            # dropped silently (and their cached inputs must not be
            # unpersisted under them).
            t_join = time.monotonic()
            docs_thread.join()
            if bloom_thread is not None:
                bloom_thread.join()
            # residual wait on the overlapped documents write / bloom fold
            # beyond the frontier write's own job (fixed-cost accounting)
            timings["write_join_wait"] = round(time.monotonic() - t_join, 3)
        if docs_err:
            raise docs_err[0]
        remaining = int(obs_frontier.get["n"])
        n_admitted = int(obs_adm.get["n"])
        n_docs = int(obs_docs.get["n"])
        # fast path: selection is the identity on the frontier (exact hint);
        # binding path: count the persisted selection (cache-local)
        n_selected = frontier_hint if not budget_binds else selected.count()
        mark("frontier_write")

        seen_from_frontier = not budget_binds
        if not seen_from_frontier:
            self.store.write_seen_delta(new_admits.select(*SEEN_COLS), rnd)
        if bloom_thread is not None and bloom_err:
            # (already joined in the write's finally; usually ~0 residual —
            # the fold ran concurrently with the frontier/documents writes)
            raise bloom_err[0]
        mark("seen_bloom")

        # rebuild `seen` from the durable deltas: a single flat multi-path
        # parquet relation — the lineage must NOT chain through this round's
        # anti-join or the logical plan doubles every round.  In the fast path
        # the frontier dir IS this round's delta but the manifest is not yet
        # committed, so it must be included explicitly — otherwise the seen
        # set lags one round and sibling-discovered URLs get re-admitted.
        seen.unpersist()
        deltas_next = self.store.read_seen(
            self.spark, rnd,
            include_frontier_rounds=(rnd,) if seen_from_frontier else (),
            exclude_compacted=self._seen_bucketed is not None,
        )
        seen_next = (
            deltas_next if deltas_next is not None else self._seen_bucketed.limit(0)
        ).persist()
        if budget_binds:
            selected.unpersist()
        extracted.unpersist()
        candidates.unpersist()
        new_admits.unpersist()
        if seq_cache is not None:
            seq_cache.unpersist()
        mark("seen_rebuild")

        metrics = {
            "selected": n_selected,
            "fetched": n_docs,
            "missed": n_selected - n_docs,
            "admitted": n_admitted,
            "remaining": remaining,
            "next_seq": next_seq + n_admitted,
            "seen_from_frontier": seen_from_frontier,
            "round_wall_s": round(time.monotonic() - t0, 3),
            "timings": timings,
            "stop": remaining == 0,
        }
        return metrics, seen_next

    # -- public API ---------------------------------------------------------------
    def run(self, start_urls: list[str], max_rounds: int = 1000, resume: bool = False) -> CrawlRun:
        spark = self.spark
        run = CrawlRun(checkpoint=self.store)

        last = self.store.last_committed() if resume else None
        if last is not None:
            # refuse to resume from a checkpoint whose data files diverge
            # from their committed lineage (truncated/overwritten parquet
            # would silently corrupt the visited set)
            self.store.verify_round(last)
            manifest = self.store.read_manifest(last)
            if manifest.get("stop"):
                run.rounds = last + 1
                return run
            frontier = self.store.read_table(spark, last, "frontier")
            next_seq = manifest["next_seq"]
            # compacted seen set (if compaction ran) is a BUCKETED scan the
            # anti-join reads exchange-free; only post-compaction deltas
            # union (and persist) here.  STATIC for the whole run —
            # compaction is maintenance between runs.  Size-gated: below
            # bucketed_min_seen the compacted files are consumed as plain
            # parquet instead (read_seen includes the seed dir), letting the
            # optimizer broadcast/hash-join the small seen side — see the
            # crossover note in __init__.
            info = self.store.bucketed_seen_info()
            use_bucketed = info is not None and (
                info.get("rows", self.bucketed_min_seen) >= self.bucketed_min_seen
            )
            self._seen_bucketed = self.store.read_seen_bucketed(spark) if use_bucketed else None
            deltas = self.store.read_seen(
                spark, last, exclude_compacted=self._seen_bucketed is not None
            )
            seen = (deltas if deltas is not None else self._seen_bucketed.limit(0)).persist()
            start_round = last + 1
            self.store.drop_uncommitted(start_round)
            frontier_hint = manifest.get("remaining", 0)
        else:
            frontier = self._bootstrap(start_urls).persist()
            next_seq = frontier.count()
            # seeds enter the seen set at admission time (T1/F7)
            frontier.select(*SEEN_COLS).write.mode("overwrite").parquet(self.store.seed_seen_dir())
            seen = spark.read.parquet(self.store.seed_seen_dir()).persist()
            self._seen_bucketed = None
            start_round = 0
            frontier_hint = next_seq
        # built lazily (complete) once the seen set crosses bloom_min_seen
        bloom = PartitionedBloom(self.bloom_shards, self.bloom_bits)
        self._bloom_built = False

        for rnd in range(start_round, start_round + max_rounds):
            metrics, seen = self._run_round(rnd, frontier, seen, bloom, next_seq, frontier_hint)
            next_seq = metrics["next_seq"]
            frontier_hint = metrics["remaining"]
            t_commit = time.monotonic()
            self.store.commit_round(rnd, {k: v for k, v in metrics.items() if k != "timings"} | {"timings": metrics["timings"]})
            # loop-level (core-count-independent) driver costs, visible in
            # run.metrics for the bench's fixed-cost accounting
            metrics["timings"]["commit"] = round(time.monotonic() - t_commit, 3)
            run.metrics.append({"round": rnd, **metrics})
            run.rounds = rnd + 1
            if metrics["stop"]:
                break
            t_inter = time.monotonic()
            seen = self._maybe_auto_compact(rnd, seen)
            frontier = self.store.read_table(spark, rnd, "frontier")
            metrics["timings"]["interround"] = round(time.monotonic() - t_inter, 3)
        return run

    def _maybe_auto_compact(self, rnd: int, seen: DataFrame) -> DataFrame:
        """Maintenance window between rounds: compact accumulated seen
        deltas into the bucketed seed table once ``auto_compact_deltas``
        directories are pending, then re-derive the round-loop seen view
        (bucketed scan vs plain, per the ``bucketed_min_seen`` crossover).

        Runs strictly AFTER ``commit_round`` — compaction only merges
        committed deltas, and a crash mid-compaction leaves a readable
        (possibly duplicated) seen set that resume tolerates
        (``compact_seen``'s atomic-swap ordering).  The Bloom filter is
        membership-based, so it stays valid across the rewrite.
        """
        if self.auto_compact_deltas is None:
            return seen
        pending = len(self.store._seen_paths(rnd, include_seed=False))
        if pending < self.auto_compact_deltas:
            return seen
        t0 = time.monotonic()
        removed = self.store.compact_seen(self.spark, rnd)
        info = self.store.bucketed_seen_info()
        use_bucketed = info is not None and (
            info.get("rows", self.bucketed_min_seen) >= self.bucketed_min_seen
        )
        self._seen_bucketed = self.store.read_seen_bucketed(self.spark) if use_bucketed else None
        # the old persisted view references delta files compaction just
        # removed — rebuild it from the new layout before anything re-reads
        seen.unpersist()
        deltas = self.store.read_seen(
            self.spark, rnd, exclude_compacted=self._seen_bucketed is not None
        )
        new_seen = (deltas if deltas is not None else self._seen_bucketed.limit(0)).persist()
        self.compactions.append(
            {
                "round": rnd,
                "deltas_merged": removed,
                "rows": info.get("rows") if info else None,
                "bucketed_in_use": self._seen_bucketed is not None,
                "wall_s": round(time.monotonic() - t0, 3),
            }
        )
        return new_seen

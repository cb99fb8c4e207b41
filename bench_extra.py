#!/usr/bin/env python
"""Round-6 optimization measurement harness (bench.py stays FROZEN).

Per-query isolation per the optimization guide §1: noop-sink timing
(guide §1.4) plus `.explain("formatted")` capture for the plan evidence in
plans/r06/.  Never used by the driver — bench.py remains the measured
contract; numbers from here are cited in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py time  [query ...]     # noop-timed medians
  python bench_extra.py plan  <tag> [query ...]  # plans/r06/<q>_<tag>.txt
  python bench_extra.py crawl [--cores N --pages P --hosts H --seed-rounds S]
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)
os.environ["PYTHONPATH"] = _REPO_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

DEFAULT_QUERIES = [
    "q01_pricing_summary", "q02_revenue_by_nation", "q06_revenue_forecast",
    "q07_top_orders_per_customer", "q10_events_daily", "q16_exact_dedup",
    "q17_token_stats", "q18_minhash_signature", "q21_cosine_topk",
    "q22_text_analysis", "q25_lsh_near_dup_pairs", "q40_decontamination",
    "q44_line_dedup", "q45_dedup_clusters", "q48_embedding_dup_clusters",
    "q51_bigram_surprisal", "q52_quality_classifier", "q54_pagerank",
    "q100_ngram_diversity", "q103_cluster_survivors", "q110_bpe_encode",
    "q121_kn_surprisal", "q123_opic", "q124_span_corruption",
]


def _session():
    from searchgov_spider_spark.session import build_session

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "64g")
    return build_session(app_name="bench-extra", master=f"local[{CPUS}]")


def time_queries(names: list[str], repeats: int = 3) -> dict:
    from searchgov_spider_spark import queries as Q

    spark = _session()
    out: dict = {}
    try:
        for name in names:
            fn = Q.QUERIES[name]
            spark.sparkContext.setJobDescription(f"warmup:{name}")
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs = []
            for i in range(repeats):
                spark.sparkContext.setJobDescription(f"{name}:{i}")
                t0 = time.monotonic()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                runs.append(round(time.monotonic() - t0, 3))
            out[name] = {"median": sorted(runs)[len(runs) // 2], "runs": runs}
            print(json.dumps({name: out[name]}), flush=True)
    finally:
        spark.stop()
    return out


def capture_plans(tag: str, names: list[str]) -> None:
    from searchgov_spider_spark import queries as Q

    os.makedirs(os.path.join(_REPO_DIR, "plans", "r06"), exist_ok=True)
    spark = _session()
    try:
        for name in names:
            df = Q.QUERIES[name](spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            path = os.path.join(_REPO_DIR, "plans", "r06", f"{name}_{tag}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"wrote {path}", flush=True)
    finally:
        spark.stop()


def crawl(cores: int, pages: int, hosts: int, seed_rounds: int) -> None:
    import bench

    res = bench.crawl_bench(
        cores, pages, hosts,
        seed_rounds=seed_rounds,
        bloom_min_seen=10000 if seed_rounds else None,
    )
    print(json.dumps(res))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    if mode == "time":
        names = sys.argv[2:] or DEFAULT_QUERIES
        res = time_queries(names)
        print(json.dumps({k: v["median"] for k, v in res.items()}, indent=1))
    elif mode == "plan":
        tag = sys.argv[2]
        names = sys.argv[3:] or DEFAULT_QUERIES
        capture_plans(tag, names)
    elif mode == "crawl":
        def _arg(name, default):
            return int(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default

        crawl(_arg("--cores", CPUS), _arg("--pages", 200_000), _arg("--hosts", 200), _arg("--seed-rounds", 0))
    else:
        raise SystemExit(f"unknown mode {mode!r}")

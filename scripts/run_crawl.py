#!/usr/bin/env python
"""Cluster entry point: run a crawl via spark-submit (north_rule run mode).

Usage:
    spark-submit --py-files searchgov_spider_spark.zip scripts/run_crawl.py \
        --seeds seeds.json --checkpoint /data/crawl_ckpt \
        [--pages /data/pages_parquet] [--resume] [--max-rounds 100] \
        [--round-seconds 3600]

``--seeds`` is a JSON-lines file of crawl configs (reference
domains/crawl-sites-*.json shape: name, allowed_domains, starting_urls,
allow_query_string, depth_limit, deny_paths).  One engine run crawls one
config (like one reference spider job); loop over configs externally or via
the scheduler of your choice.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", required=True)
    ap.add_argument("--config-name", default=None, help="which seed config to crawl (default: first)")
    ap.add_argument("--pages", default=None, help="pages parquet (TableFetcher); omit for GeneratorFetcher demo web")
    ap.add_argument("--robots", default=None, help="robots parquet (host, fetched_ts, rules_text)")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--max-rounds", type=int, default=1000)
    ap.add_argument("--round-seconds", type=float, default=3600.0)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from searchgov_spider_spark.crawl import CrawlEngine, CrawlPolicy
    from searchgov_spider_spark.flows import validate_seeds

    spark = SparkSession.builder.appName("searchgov-crawl").getOrCreate()

    with open(args.seeds) as f:
        configs = [json.loads(line) for line in f if line.strip()]
    seeds_df = spark.createDataFrame(configs)
    violations = validate_seeds(seeds_df).collect()
    if violations:
        for v in violations:
            print(f"seed config invalid: {v['value']}: {v['violation']}", file=sys.stderr)
        return 2

    cfg = next((c for c in configs if c["name"] == args.config_name), configs[0])
    policy = CrawlPolicy(
        allowed_domains=[d.strip() for d in cfg["allowed_domains"].split(",")],
        allow_query_string=bool(cfg.get("allow_query_string", False)),
        depth_limit=int(cfg.get("depth_limit", 3)),
        deny_paths=list(cfg.get("deny_paths") or []),
    )
    start_urls = [u.strip() for u in cfg["starting_urls"].split(",")]

    pages = spark.read.parquet(args.pages) if args.pages else None
    robots = spark.read.parquet(args.robots) if args.robots else None
    fetcher = None
    if pages is None:
        from searchgov_spider_spark.crawl.fetch import GeneratorFetcher

        fetcher = GeneratorFetcher(20_000, 60)

    engine = CrawlEngine(
        spark, pages, robots, policy, args.checkpoint,
        fetcher=fetcher, round_seconds=args.round_seconds,
    )
    run = engine.run(start_urls, max_rounds=args.max_rounds, resume=args.resume)
    for m in run.metrics:
        print(json.dumps(m))
    return 0


if __name__ == "__main__":
    sys.exit(main())

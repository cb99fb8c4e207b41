#!/usr/bin/env bash
# Package the engine and launch a crawl via spark-submit --py-files
# (north_rule run mode).  On a real cluster, swap --master for your
# cluster manager and size executors:
#   --master yarn --num-executors $N --executor-cores 4 --executor-memory 8g
set -euo pipefail
cd "$(dirname "$0")/.."

ZIP=searchgov_spider_spark.zip
rm -f "$ZIP"
zip -qr "$ZIP" searchgov_spider_spark -x '*__pycache__*'

exec spark-submit \
  --master "${SPARK_MASTER:-local[${SPARK_GRAFT_CPUS:-32}]}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-64}" \
  --py-files "$ZIP" \
  scripts/run_crawl.py "$@"

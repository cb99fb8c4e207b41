"""searchgov_spider_spark — a from-scratch PySpark-native crawl & web-text
analytics engine with the capabilities of GSA-TTS/searchgov-spider.

Layers:
  kernels/    pure-Python byte-parity reference implementations
  functions/  Arrow-batched pandas UDF wrappers over the kernels
  synth/      deterministic synthetic web generator (fixtures)
  crawl/      frontier + dedup + politeness + BFS round engine
  operators/  training-data operators (dedup, similarity, text stats)
  storage/    checkpointed table IO (parquet round manifests)
"""

__version__ = "0.1.0"

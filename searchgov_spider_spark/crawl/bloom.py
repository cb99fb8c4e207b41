"""Partitioned Bloom filter for the URL-seen set (north_rule requirement).

Design for 10^10-URL scale: the seen-set is authoritative as a hash-bucketed
table (anti-join), but probing it for every discovered link would shuffle the
full candidate stream every round.  Instead we maintain a sharded Bloom
filter built *per partition* on executors and OR-merged on the driver — only
fixed-size bitmaps cross the driver, never URL sets.  Each round:

  1. candidates are probed against the broadcast Bloom (vectorized numpy UDF);
  2. "definitely new" rows (no false negatives possible) skip the anti-join;
  3. "maybe seen" rows — a small slice: true dupes + false positives — go
     through the authoritative ``left_anti`` join against the seen table;
  4. newly admitted hashes are folded into the filter for the next round.

At 10^10 URLs with 64 shards x 2^27 bits ≈ 1 GiB of bitmap on the driver and
k=4 probes, fpp stays low while the anti-join shuffle shrinks by ~the dup
rate.  Shard count and bits are configurable; sandbox defaults are small.

Reference analog: the Redis SET dupefilter probe before enqueue
(search_gov_crawler/search_gov_spiders/job_state/dupefilter.py:8-25).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _mix(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — derives the second hash for double hashing."""
    h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9) & _MASK64
    h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB) & _MASK64
    return h ^ (h >> np.uint64(31))


class PartitionedBloom:
    """Sharded Bloom filter over signed-64 url hashes."""

    def __init__(self, n_shards: int = 16, bits_per_shard: int = 1 << 20, k: int = 4):
        assert bits_per_shard % 8 == 0
        self.n_shards = n_shards
        self.bits = bits_per_shard
        self.k = k
        self.shards = np.zeros((n_shards, bits_per_shard // 8), dtype=np.uint8)

    # -- vectorized core -------------------------------------------------------
    def _positions(self, hashes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(shard_idx[n], bit_positions[n, k]) for unsigned-viewed hashes."""
        uh = hashes.astype(np.int64).view(np.uint64)
        shard = (uh % np.uint64(self.n_shards)).astype(np.int64)
        h1 = uh
        h2 = _mix(uh) | np.uint64(1)
        probes = np.empty((len(uh), self.k), dtype=np.uint64)
        for i in range(self.k):
            probes[:, i] = (h1 + np.uint64(i) * h2) & _MASK64
        return shard, (probes % np.uint64(self.bits)).astype(np.int64)

    def add_array(self, hashes: np.ndarray) -> None:
        if len(hashes) == 0:
            return
        shard, pos = self._positions(hashes)
        byte_idx = pos >> 3
        bit_mask = np.left_shift(1, (pos & 7)).astype(np.uint8)
        for i in range(self.k):
            np.bitwise_or.at(self.shards, (shard, byte_idx[:, i]), bit_mask[:, i])

    def contains_array(self, hashes: np.ndarray) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        shard, pos = self._positions(hashes)
        byte_idx = pos >> 3
        bit_mask = np.left_shift(1, (pos & 7)).astype(np.uint8)
        result = np.ones(len(hashes), dtype=bool)
        for i in range(self.k):
            result &= (self.shards[shard, byte_idx[:, i]] & bit_mask[:, i]) != 0
        return result

    def merge_shard_bytes(self, shard_id: int, data: bytes) -> None:
        self.shards[shard_id] |= np.frombuffer(data, dtype=np.uint8)

    def nbytes(self) -> int:
        return int(self.shards.nbytes)


def build_shard_bitmaps(
    df: DataFrame, hash_col: str, n_shards: int, bits_per_shard: int, k: int
) -> list[tuple[int, bytes]]:
    """Per-partition Bloom build on executors; only bitmaps reach the driver.

    Returns [(shard_id, bitmap_bytes)] ready to OR-merge into a
    PartitionedBloom.  Uses ``mapInPandas`` so each task folds its partition
    into at most ``n_shards`` small bitmaps.
    """
    schema = T.StructType(
        [T.StructField("shard", T.IntegerType()), T.StructField("bitmap", T.BinaryType())]
    )

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = PartitionedBloom(n_shards, bits_per_shard, k)
        touched = np.zeros(n_shards, dtype=bool)
        for pdf in batches:
            hashes = pdf.iloc[:, 0].to_numpy(dtype=np.int64)
            shard, _ = local._positions(hashes)
            touched[np.unique(shard)] = True
            local.add_array(hashes)
        rows = [(int(s), local.shards[s].tobytes()) for s in range(n_shards) if touched[s]]
        yield pd.DataFrame(rows, columns=["shard", "bitmap"])

    rows = df.select(F.col(hash_col)).mapInPandas(fold, schema=schema).collect()
    return [(r["shard"], r["bitmap"]) for r in rows]


def bloom_from_df(
    df: DataFrame | None,
    hash_col: str = "url_hash",
    n_shards: int = 16,
    bits_per_shard: int = 1 << 20,
    k: int = 4,
) -> PartitionedBloom:
    bloom = PartitionedBloom(n_shards, bits_per_shard, k)
    if df is not None:
        for shard_id, bitmap in build_shard_bitmaps(df, hash_col, n_shards, bits_per_shard, k):
            bloom.merge_shard_bytes(shard_id, bitmap)
    return bloom


def with_bloom_probe(
    spark: SparkSession, df: DataFrame, bloom: PartitionedBloom, hash_col: str, out_col: str = "maybe_seen"
) -> DataFrame:
    """Append a boolean ``maybe_seen`` column via a broadcast Bloom probe."""
    bc = spark.sparkContext.broadcast(
        {"shards": bloom.shards, "n": bloom.n_shards, "bits": bloom.bits, "k": bloom.k}
    )

    @F.pandas_udf(T.BooleanType())
    def probe(hashes: pd.Series) -> pd.Series:
        state = bc.value
        local = PartitionedBloom(state["n"], state["bits"], state["k"])
        local.shards = state["shards"]
        return pd.Series(local.contains_array(hashes.to_numpy(dtype=np.int64)))

    return df.withColumn(out_col, probe(F.col(hash_col)))

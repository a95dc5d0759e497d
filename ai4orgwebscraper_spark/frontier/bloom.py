"""Partitioned Bloom-filter URL-seen set (SURVEY.md C4, north rule:
"partitioned bloom/cuckoo-filter URL-seen set keyed by canonicalized
URL hash").

Design: the seen set is sharded by ``pmod(xxhash64(url_hash), P)``;
each shard owns an independent Bloom bitmap sized for its expected
cardinality. Shards are built distributedly (one ``applyInPandas``
group per shard), collected as compact bytes (a 10^10-URL seen set at
1% fpp is ~11.5 GiB total — ~12 MiB per shard at P=1024, so shards
stream through the driver but never concentrate), and broadcast for
the candidate prefilter. Membership tests run inside a vectorized
Arrow UDF; the EXACT anti-join remains the authority — the bloom has
no false negatives, so the prefilter is result-transparent (golden
tests keep passing with it on or off) and only exists to shrink the
join's build side at scale.

Hashing: double hashing h1 + i*h2 over the md5 hex key the engine
already carries (the url_hash column) — deterministic across
processes, no RNG (north-rule resumability).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SHARDS = 64
DEFAULT_FPP = 0.01


def _params(expected_n: int, fpp: float) -> tuple[int, int]:
    """(bits, k) for a bloom filter of expected_n items at fpp."""
    n = max(expected_n, 1)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _hashes(url_hash_hex: str) -> tuple[int, int]:
    """Two independent 60-bit streams from the md5 hex key itself."""
    h1 = int(url_hash_hex[:15], 16)
    h2 = int(url_hash_hex[15:30], 16) | 1  # odd -> full-period stepping
    return h1, h2


def _set_bits(bitmap: np.ndarray, key: str, m: int, k: int) -> None:
    h1, h2 = _hashes(key)
    for i in range(k):
        pos = (h1 + i * h2) % m
        bitmap[pos >> 3] |= 1 << (pos & 7)


def _test_bits(bitmap: np.ndarray, key: str, m: int, k: int) -> bool:
    h1, h2 = _hashes(key)
    for i in range(k):
        pos = (h1 + i * h2) % m
        if not (bitmap[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


class PartitionedBloom:
    """shard id -> (bitmap bytes, m, k); picklable, broadcast-friendly."""

    def __init__(self, shards: dict[int, tuple[bytes, int, int]], n_shards: int):
        self.shards = shards
        self.n_shards = n_shards

    def might_contain(self, url_hash_hex: str) -> bool:
        shard = int(url_hash_hex[:8], 16) % self.n_shards
        entry = self.shards.get(shard)
        if entry is None:
            return False
        bitmap, m, k = entry
        return _test_bits(np.frombuffer(bitmap, dtype=np.uint8), url_hash_hex, m, k)


def build_bloom(
    seen: DataFrame,
    n_shards: int = DEFAULT_SHARDS,
    fpp: float = DEFAULT_FPP,
    expected_per_shard: int | None = None,
) -> PartitionedBloom:
    """Build the sharded bloom from the seen table (url_hash column).

    Shard assignment uses the first 4 bytes of the md5 key (not
    xxhash64(column) — the Python-side membership test must compute the
    same shard without a JVM)."""
    if expected_per_shard is None:
        total = seen.count()
        expected_per_shard = max(64, int(total / max(n_shards, 1) * 1.5))
    m, k = _params(expected_per_shard, fpp)

    shard_col = (
        F.conv(F.substring("url_hash", 1, 8), 16, 10).cast("long") % n_shards
    ).alias("__shard")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        bitmap = np.zeros((m + 7) // 8, dtype=np.uint8)
        for key in pdf["url_hash"]:
            _set_bits(bitmap, key, m, k)
        return pd.DataFrame(
            {"shard": [int(pdf["__shard"].iloc[0])], "bitmap": [bitmap.tobytes()]}
        )

    rows = (
        seen.select("url_hash", shard_col)
        .groupBy("__shard")
        .applyInPandas(build, schema="shard int, bitmap binary")
        .collect()
    )
    return PartitionedBloom(
        {r["shard"]: (bytes(r["bitmap"]), m, k) for r in rows}, n_shards
    )


def prefilter_new(
    candidates: DataFrame, bloom: PartitionedBloom | list[PartitionedBloom]
) -> DataFrame:
    """Split candidates into definitely-new rows (every bloom says
    absent — NO exact join needed, blooms have no false negatives) vs
    maybe-seen rows (must be confirmed by the exact anti-join).
    Accepts one bloom or a list of incremental round blooms (membership
    = OR across them — the append-only delta-parts structure of the
    seen set). Returns candidates with a ``__maybe_seen`` column."""
    blooms = bloom if isinstance(bloom, list) else [bloom]
    spark = candidates.sparkSession
    bc = spark.sparkContext.broadcast(blooms)

    @F.pandas_udf("boolean")
    def maybe_seen(url_hashes: pd.Series) -> pd.Series:
        bs = bc.value
        return url_hashes.map(lambda h: any(b.might_contain(h) for b in bs))

    return candidates.withColumn("__maybe_seen", maybe_seen(F.col("url_hash")))

"""Partitioned Cuckoo-filter URL-seen set — the deletion-capable twin
of the sharded Bloom filter (north rule: "partitioned bloom/cuckoo-
filter URL-seen set keyed by canonicalized URL hash"; SURVEY.md C4).

Same distributed shape as ``bloom.py``: the seen set is sharded by the
first 4 bytes of the md5 url key mod P; each shard owns an independent
cuckoo table (power-of-two buckets x 4 slots of 16-bit fingerprints).
Shards are built with one ``applyInPandas`` group per shard and STAY a
DataFrame — membership tests run shard-co-partitioned via cogroup, so
no table bytes ever concentrate on the driver.

What cuckoo buys over bloom at the same fpp:
- **deletion**: a fetched-then-retracted URL (rolled-back round,
  pruned checkpoint) can be REMOVED from the filter — a bloom can only
  grow, so round rollbacks force a full rebuild there;
- slightly better space below ~1% fpp (16-bit fingerprints at 4-way
  buckets ≈ 0.0015 fpp at ~95% load).
Inserts are MULTISET: each distinct inserted key stores its own
fingerprint copy (so deleting one inserted key can never hide another
inserted key, even on a fingerprint collision). The standard cuckoo
caveat still applies to NEVER-inserted keys: deleting one can strip
some inserted key's identical fingerprint and create a false negative
— only delete what you inserted.

Hashing: fingerprint and bucket index both derive from the md5 hex key
the engine already carries (url_hash) — deterministic across
processes, no RNG. The alternate bucket is ``i ^ g(fp)`` with
power-of-two table size, so partner lookup is an involution and needs
no stored direction bit (the classic partial-key cuckoo hashing of
Fan et al., "Cuckoo Filter: Practically Better Than Bloom", CoNEXT'14).

Like the bloom, the filter is result-transparent inside the engine:
the exact anti-join remains the authority; a cuckoo filter has no
false negatives for inserted keys, so the prefilter only shrinks the
join's build side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ai4orgwebscraper_spark.frontier.bloom import _shard_col

DEFAULT_SHARDS = 64
SLOTS = 4
MAX_KICKS = 500
# target load factor when sizing from an expected cardinality: 4-way
# cuckoo tables sustain ~95%; sizing at 80% keeps the deterministic
# eviction path short
TARGET_LOAD = 0.8
_G_MULT = 0x5BD1E995  # fingerprint spread multiplier (MurmurHash2 M)

CUCKOO_SHARDS_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("table", T.BinaryType(), False),
        T.StructField("m_buckets", T.LongType(), False),
        # carried in-row so membership tests can verify their routing
        # modulus (same loud-mismatch contract as bloom.BLOOM_SHARDS_SCHEMA)
        T.StructField("n_shards", T.IntegerType(), False),
    ]
)


class CuckooShardMismatch(RuntimeError):
    """Membership test routed with a different n_shards than the tables
    were built under — verdicts would silently be wrong."""


class CuckooOverflow(RuntimeError):
    """A shard's eviction chain exceeded MAX_KICKS — the table is over
    capacity. Deterministic and loud: resize (bigger expected_per_shard)
    instead of silently dropping keys."""


def _pow2_buckets(expected_n: int) -> int:
    need = max(expected_n / (SLOTS * TARGET_LOAD), 1.0)
    m = 1
    while m < need:
        m <<= 1
    return m


def _fp(keys: pd.Series) -> np.ndarray:
    """16-bit nonzero fingerprints from hex chars 24:28 of the md5 key."""
    raw = np.array([int(k[24:28], 16) for k in keys], dtype=np.uint32)
    return ((raw % 65535) + 1).astype(np.uint16)


def _i1(keys: pd.Series, m: int) -> np.ndarray:
    return np.array([int(k[:15], 16) & (m - 1) for k in keys], dtype=np.int64)


def _alt(i: np.ndarray | int, fp: np.ndarray | int, m: int):
    # `| 1` forces the XOR term odd so the alternate bucket ALWAYS
    # differs from i (hypothesis r03: a fingerprint whose spread
    # hashed to 0 mod m had only ONE bucket — its eviction walk cycled
    # in place and overflowed at 50% load). Still an involution.
    return (i ^ (((fp * _G_MULT) | 1) & (m - 1))) & (m - 1)


def _insert_all(table: np.ndarray, i1: np.ndarray, fps: np.ndarray, m: int) -> None:
    """MULTISET insert: every key stores its own fingerprint copy, even
    when a distinct key already holds an identical fingerprint in an
    overlapping bucket. This is what makes deletion sound — with a
    dedup-on-insert, two colliding inserted keys would share ONE stored
    copy and deleting either would silently evict the other (a false
    negative for an inserted key, review r03). Same-key duplicates are
    removed batch-side in build_cuckoo_shards."""
    for i, fp in zip(i1, fps):
        fp = int(fp)
        i = int(i)
        j = _alt(i, fp, m)
        placed = False
        for b in (i, j):
            empty = np.nonzero(table[b] == 0)[0]
            if empty.size:
                table[b, empty[0]] = fp
                placed = True
                break
        if placed:
            continue
        # deterministic eviction walk. The kick slot depends on the
        # EVICTED fingerprint, not only the kick counter (r6 fix,
        # VERDICT r05 #1): with `slot = kick % SLOTS` the walk was a
        # pure function of (start bucket, kick index), so a small set
        # of colliding fingerprints could trap the chain in a short
        # (bucket, slot) cycle while empty slots sat elsewhere — a
        # Hypothesis-found 13-key set overflowed at load 0.38
        # (regression-pinned in tests/test_cuckoo_properties.py).
        # Folding cur_fp in breaks such cycles (the victim choice now
        # varies along the chain) while staying RNG-free — resume
        # bit-identity holds because the walk is still a pure function
        # of the inserted key multiset.
        cur_i, cur_fp = i, fp
        for kick in range(MAX_KICKS):
            slot = (kick + cur_fp) % SLOTS
            cur_fp, table[cur_i, slot] = int(table[cur_i, slot]), cur_fp
            cur_i = _alt(cur_i, cur_fp, m)
            empty = np.nonzero(table[cur_i] == 0)[0]
            if empty.size:
                table[cur_i, empty[0]] = cur_fp
                break
        else:
            raise CuckooOverflow(
                f"eviction chain exceeded {MAX_KICKS} kicks at load "
                f"{np.count_nonzero(table) / table.size:.2f}; resize the shard"
            )


MAX_RESIZES = 24  # termination guard for the doubling loop below


def _build_table(keys: pd.Series, m: int) -> tuple[np.ndarray, int]:
    """Build one shard's table, RESIZING (m ← 2m, rebuild) on overflow
    instead of raising (r6 fix, VERDICT r05 #1): an unlucky key set no
    longer kills the crawl — the shard grows deterministically until
    every key places. Rebuild-from-scratch keeps the table a pure
    function of (key multiset, final m): bit-identical across
    processes and resumes. Raising only survives as a last-resort
    guard after MAX_RESIZES doublings (astronomically more colliding
    md5 slices than a real key set can produce)."""
    raw = np.array([int(k[:15], 16) for k in keys], dtype=np.int64)
    fps = _fp(keys)
    for _ in range(MAX_RESIZES):
        table = np.zeros((m, SLOTS), dtype=np.uint16)
        try:
            _insert_all(table, raw & (m - 1), fps, m)
            return table, m
        except CuckooOverflow:
            m <<= 1
    raise CuckooOverflow(
        f"shard still overflows after {MAX_RESIZES} doublings "
        f"({len(keys)} keys) — degenerate fingerprint collisions"
    )


def build_cuckoo_shards(
    seen: DataFrame,
    n_shards: int = DEFAULT_SHARDS,
    expected_per_shard: int | None = None,
) -> DataFrame:
    """Distributed cuckoo build: one applyInPandas group per shard →
    DataFrame(shard, table, m_buckets, n_shards). Never collected —
    same contract as bloom.build_bloom_shards. Shards size
    independently: each carries its own m_buckets, so a shard that had
    to resize (see _build_table) interoperates with its siblings."""
    if expected_per_shard is None:
        total = seen.count()
        expected_per_shard = max(64, int(total / max(n_shards, 1) * 1.5))
    m0 = _pow2_buckets(expected_per_shard)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        # one copy per DISTINCT key (multiset across keys, set per key)
        pdf = pdf.drop_duplicates(subset=["url_hash"])
        table, m = _build_table(pdf["url_hash"], m0)
        return pd.DataFrame(
            {
                "shard": [int(pdf["__shard"].iloc[0])],
                "table": [table.tobytes()],
                "m_buckets": [m],
                "n_shards": [n_shards],
            }
        )

    return (
        seen.select("url_hash", _shard_col(n_shards).alias("__shard"))
        .groupBy("__shard")
        .applyInPandas(build, schema=CUCKOO_SHARDS_SCHEMA)
    )


# uniform seen-filter interface (engine swaps bloom/cuckoo by module)
build_shards = build_cuckoo_shards


def prefilter_new(
    candidates: DataFrame,
    shards: DataFrame | list[DataFrame],
    n_shards: int = DEFAULT_SHARDS,
) -> DataFrame:
    """Bloom-compatible membership prefilter: candidates gain a
    ``__maybe_seen`` column (OR across a shard's table rows for
    incremental round deltas). Same cogrouped plan as
    bloom.prefilter_new — one shuffle of candidate keys, table bytes
    move executor-to-executor only."""
    parts = shards if isinstance(shards, list) else [shards]
    shards_all = parts[0]
    for p in parts[1:]:
        shards_all = shards_all.unionByName(p)

    out_schema = T.StructType(
        list(candidates.schema.fields)
        + [T.StructField("__maybe_seen", T.BooleanType(), False)]
    )
    cand_cols = candidates.columns

    def test(cand_pdf: pd.DataFrame, shard_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty:
            return pd.DataFrame(columns=cand_cols + ["__maybe_seen"])
        out = cand_pdf[cand_cols].copy()
        if shard_pdf.empty:
            out["__maybe_seen"] = False
            return out
        built_under = set(int(x) for x in shard_pdf["n_shards"])
        if built_under != {n_shards}:
            raise CuckooShardMismatch(
                f"routing with n_shards={n_shards} but tables were built "
                f"under n_shards={sorted(built_under)}"
            )
        seen = np.zeros(len(out), dtype=bool)
        fps = _fp(cand_pdf["url_hash"])
        for tbl_bytes, m in zip(shard_pdf["table"], shard_pdf["m_buckets"]):
            m = int(m)
            table = np.frombuffer(tbl_bytes, dtype=np.uint16).reshape(m, SLOTS)
            i1 = _i1(cand_pdf["url_hash"], m)
            i2 = _alt(i1, fps.astype(np.int64), m)
            hit = (table[i1] == fps[:, None]).any(axis=1) | (
                table[i2] == fps[:, None]
            ).any(axis=1)
            seen |= hit
        out["__maybe_seen"] = seen
        return out

    return (
        candidates.withColumn("__shard", _shard_col(n_shards))
        .groupBy("__shard")
        .cogroup(shards_all.groupBy("shard"))
        .applyInPandas(test, schema=out_schema)
    )


def delete_keys(
    shards: DataFrame,
    keys: DataFrame,
    n_shards: int = DEFAULT_SHARDS,
) -> DataFrame:
    """Remove previously-inserted keys from the filter (the operation a
    bloom cannot do) — returns a NEW shards DataFrame; the input is
    untouched (append-only snapshot semantics, like every state table
    here). Runs shard-co-partitioned: keys are cogrouped with their
    shard's table row and each fingerprint's first occurrence in its
    two candidate buckets is zeroed.

    Only delete keys that were actually inserted (standard cuckoo
    contract; deleting an absent key can evict another key's identical
    fingerprint and manufacture a false negative)."""

    def drop(shard_pdf: pd.DataFrame, key_pdf: pd.DataFrame) -> pd.DataFrame:
        if shard_pdf.empty:
            return pd.DataFrame(columns=[f.name for f in CUCKOO_SHARDS_SCHEMA.fields])
        # a shard may hold SEVERAL table rows (incremental round deltas
        # — the same append-only structure prefilter_new ORs over);
        # every row must survive, and a delete removes one copy from
        # the FIRST row that holds the fingerprint (review r03: the
        # old iloc[0] path silently discarded all later rows)
        tables = [
            np.frombuffer(r["table"], dtype=np.uint16)
            .reshape(int(r["m_buckets"]), SLOTS)
            .copy()
            for _, r in shard_pdf.iterrows()
        ]
        if not key_pdf.empty:
            for key, fp in zip(key_pdf["url_hash"], _fp(key_pdf["url_hash"])):
                fp = int(fp)
                for t_idx, table in enumerate(tables):
                    m = int(shard_pdf.iloc[t_idx]["m_buckets"])
                    i = int(key[:15], 16) & (m - 1)
                    removed = False
                    for b in (i, _alt(i, fp, m)):
                        slots = np.nonzero(table[b] == fp)[0]
                        if slots.size:
                            table[b, slots[0]] = 0
                            removed = True
                            break
                    if removed:
                        break
        return pd.DataFrame(
            {
                "shard": [int(r["shard"]) for _, r in shard_pdf.iterrows()],
                "table": [t.tobytes() for t in tables],
                "m_buckets": [int(r["m_buckets"]) for _, r in shard_pdf.iterrows()],
                "n_shards": [int(r["n_shards"]) for _, r in shard_pdf.iterrows()],
            }
        )

    return (
        shards.groupBy("shard")
        .cogroup(
            keys.select("url_hash", _shard_col(n_shards).alias("__shard")).groupBy(
                "__shard"
            )
        )
        .applyInPandas(drop, schema=CUCKOO_SHARDS_SCHEMA)
    )

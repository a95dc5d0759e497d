"""Property-based invariants of the cuckoo-filter core (numpy level,
no Spark — these run in milliseconds and explore the key space far
beyond the example-based suite):

1. no false negatives: every inserted key tests present;
2. deletion soundness: deleting an inserted subset keeps every
   survivor present;
3. insert is idempotent: re-inserting present keys never overflows or
   changes membership;
4. fingerprints are never 0 (0 is the empty-slot sentinel).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from ai4orgwebscraper_spark.frontier import cuckoo as C


def _md5s(ints: list[int]) -> list[str]:
    return [hashlib.md5(str(i).encode()).hexdigest() for i in ints]


def _build(keys: list[str], m: int) -> np.ndarray:
    table = np.zeros((m, C.SLOTS), dtype=np.uint16)
    s = pd.Series(keys)
    C._insert_all(table, C._i1(s, m), C._fp(s), m)
    return table


def _present(table: np.ndarray, key: str, m: int) -> bool:
    fp = int(C._fp(pd.Series([key]))[0])
    i = int(key[:15], 16) & (m - 1)
    j = C._alt(i, fp, m)
    return bool((table[i] == fp).any() or (table[j] == fp).any())


keysets = st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=300)


@settings(max_examples=60, deadline=None)
@given(keysets)
def test_no_false_negatives(ints):
    keys = _md5s(sorted(ints))
    m = C._pow2_buckets(len(keys))
    table = _build(keys, m)
    assert all(_present(table, k, m) for k in keys)


@settings(max_examples=60, deadline=None)
@given(keysets, st.randoms(use_true_random=False))
def test_delete_keeps_survivors(ints, rnd):
    keys = _md5s(sorted(ints))
    m = C._pow2_buckets(len(keys))
    table = _build(keys, m)
    doomed = set(rnd.sample(keys, k=len(keys) // 2))
    for key in doomed:
        fp = int(C._fp(pd.Series([key]))[0])
        i = int(key[:15], 16) & (m - 1)
        for b in (i, C._alt(i, fp, m)):
            slots = np.nonzero(table[b] == fp)[0]
            if slots.size:
                table[b, slots[0]] = 0
                break
    # a survivor that shares (fingerprint, bucket-pair overlap) with a
    # doomed key was deduplicated at insert time (one stored copy for
    # both) — losing it on delete is the documented cuckoo caveat, not
    # a bug; exempt those ultra-rare collisions from the invariant
    def sig(k):
        fp = int(C._fp(pd.Series([k]))[0])
        i = int(k[:15], 16) & (m - 1)
        return fp, {i, int(C._alt(i, fp, m))}

    doomed_sigs = [sig(d) for d in doomed]
    survivors = [
        k
        for k in keys
        if k not in doomed
        and not any(fp == sig(k)[0] and (b & sig(k)[1]) for fp, b in doomed_sigs)
    ]
    assert all(_present(table, k, m) for k in survivors)


@settings(max_examples=30, deadline=None)
@given(keysets)
def test_reinsert_idempotent(ints):
    keys = _md5s(sorted(ints))
    m = C._pow2_buckets(len(keys))
    table = _build(keys, m)
    before = table.copy()
    s = pd.Series(keys)
    C._insert_all(table, C._i1(s, m), C._fp(s), m)  # second pass
    assert np.array_equal(table, before)  # set semantics, no growth


@settings(max_examples=30, deadline=None)
@given(keysets)
def test_fingerprints_nonzero(ints):
    fps = C._fp(pd.Series(_md5s(sorted(ints))))
    assert (fps != 0).all()

"""Property-based invariants of the cuckoo-filter core (numpy level,
no Spark — these run in milliseconds and explore the key space far
beyond the example-based suite):

1. no false negatives: every inserted key tests present;
2. deletion soundness: deleting an inserted subset keeps every
   survivor present;
3. multiset copies: a double-inserted key survives one delete and
   (absent fingerprint siblings) vanishes after the second;
4. fingerprints are never 0 (0 is the empty-slot sentinel).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from hypothesis import assume, example, given, settings
from hypothesis import strategies as st

from ai4orgwebscraper_spark.frontier import cuckoo as C


def _md5s(ints: list[int]) -> list[str]:
    return [hashlib.md5(str(i).encode()).hexdigest() for i in ints]


def _build(keys: list[str], m: int) -> np.ndarray:
    table = np.zeros((m, C.SLOTS), dtype=np.uint16)
    s = pd.Series(keys)
    C._insert_all(table, C._i1(s, m), C._fp(s), m)
    return table


# the 13-key set (md5s of deterministic strings) on which the r5-era
# deterministic eviction walk (`slot = kick % SLOTS`) cycled and raised
# CuckooOverflow at load 0.38 — the VERDICT r05 #1 failure class. The
# r6 fingerprint-dependent kick slot must place it at the ORIGINAL
# TARGET_LOAD sizing, no resize needed.
REGRESSION_13 = [
    "51ca797a8f84b580bf44b6e30c1e953f", "0d373e2573871b0c72930ab492644aba",
    "2b4087dcf5cb7487187dafeaa09ef194", "7b19c5d62a3eb83be2967137a30745c7",
    "94b3044352603391298dcbf0f96f95c8", "8bdb2ac687fddcb56611348355eec46e",
    "54ff61c231302733eda59b1937c40e82", "cde5f8c25de6c02bb6acaebe81fb484c",
    "eca07822b2b96f57e4ee85d56abdbce5", "0e4e8865ce1d740301bd5d9950b80ffd",
    "dce3b04b22d40a81c4bfb1d0fba87801", "a11be2ea63934b303707cfa5e1ee6d83",
    "afafce72627b8d03da3206e3c5ae1bf5",
]


def test_regression_13_key_cycle_places_without_resize():
    m = C._pow2_buckets(len(REGRESSION_13))
    table = _build(REGRESSION_13, m)  # r5 walk raised CuckooOverflow here
    assert all(_present(table, k, m) for k in REGRESSION_13)


def test_build_table_resizes_instead_of_raising(monkeypatch):
    """Even when the walk genuinely overflows (forced via MAX_KICKS=0),
    _build_table doubles m and retries instead of killing the crawl,
    and every key stays present at the final size."""
    monkeypatch.setattr(C, "MAX_KICKS", 0)
    keys = _md5s(list(range(40)))
    table, m = C._build_table(pd.Series(keys), C._pow2_buckets(len(keys)))
    assert m >= C._pow2_buckets(len(keys))
    assert all(_present(table, k, m) for k in keys)


def _present(table: np.ndarray, key: str, m: int) -> bool:
    fp = int(C._fp(pd.Series([key]))[0])
    i = int(key[:15], 16) & (m - 1)
    j = C._alt(i, fp, m)
    return bool((table[i] == fp).any() or (table[j] == fp).any())


keysets = st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=300)


@settings(max_examples=60, deadline=None)
@given(keysets)
@example(
    ints={10, 115, 179, 195, 724258862},
).via('discovered failure')
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
    # multiset inserts mean every inserted key owns a copy — deleting
    # an inserted subset can NEVER hide a surviving inserted key, even
    # on fingerprint collisions (no exemptions needed)
    survivors = [k for k in keys if k not in doomed]
    assert all(_present(table, k, m) for k in survivors)


@settings(max_examples=30, deadline=None)
@given(keysets)
def test_multiset_copies_survive_partial_delete(ints):
    """Each insert stores its own copy: after inserting the probe key
    a second time, deleting one copy keeps it present and deleting the
    second makes it absent — the multiset contract that keeps deletion
    sound under fingerprint collisions."""
    keys = _md5s(sorted(ints))
    m = C._pow2_buckets(4 * len(keys))
    table = _build(keys, m)
    probe = keys[0]
    s = pd.Series([probe])
    try:
        C._insert_all(table, C._i1(s, m), C._fp(s), m)  # second copy of probe
    except C.CuckooOverflow:
        # the probe's bucket pair is saturated (hypothesis can hunt
        # pair-collisions at tiny m) — a LOUD resize signal, which is
        # correct behavior but not the deletion semantics under test
        assume(False)

    def delete_once(key):
        fp = int(C._fp(pd.Series([key]))[0])
        i = int(key[:15], 16) & (m - 1)
        for b in (i, C._alt(i, fp, m)):
            slots = np.nonzero(table[b] == fp)[0]
            if slots.size:
                table[b, slots[0]] = 0
                return

    n_copies_of_probe_fp = sum(
        1 for k in keys if C._fp(pd.Series([k]))[0] == C._fp(pd.Series([probe]))[0]
    )
    delete_once(probe)
    assert _present(table, probe, m)  # second copy still there
    if n_copies_of_probe_fp == 1:  # no colliding sibling keys
        delete_once(probe)
        assert not _present(table, probe, m)


@settings(max_examples=30, deadline=None)
@given(keysets)
def test_fingerprints_nonzero(ints):
    fps = C._fp(pd.Series(_md5s(sorted(ints))))
    assert (fps != 0).all()

"""K-means vs the pure-Python twin on planted well-separated clusters
(separation >> float noise, so assignments must match EXACTLY; centroid
coordinates to 1e-9)."""

from __future__ import annotations

import hashlib

from ai4orgwebscraper_spark.operators.clustering import kmeans, kmeans_py


def _planted(n_per: int = 40, k: int = 4, dim: int = 8):
    """k well-separated blobs: center j at 10*j on every axis, members
    offset deterministically by tiny hash jitter. Ids INTERLEAVE blobs
    (id = m*k + j) so the deterministic first-k init lands one centroid
    per blob — with all k init points in one blob, Lloyd legitimately
    splits it instead (not a bug, just k-means)."""
    vecs = {}
    for j in range(k):
        for m in range(n_per):
            h = hashlib.md5(f"{j}|{m}".encode()).digest()
            vecs[m * k + j] = [10.0 * j + (h[d] / 255.0 - 0.5) for d in range(dim)]
    return vecs


def test_kmeans_matches_twin_and_recovers_blobs(spark):
    vecs = _planted()
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    assigned, cents = kmeans(df, k=4, iterations=5)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    want, want_cents = kmeans_py(vecs, k=4, iterations=5)
    assert got == want  # exact assignment parity
    for c_spark, c_py in zip(cents, want_cents):
        assert max(abs(a - b) for a, b in zip(c_spark, c_py)) < 1e-9
    # blobs recovered: every planted blob lands in ONE cluster
    blobs = {}
    for i, cl in got.items():
        blobs.setdefault(i % 4, set()).add(cl)
    assert all(len(s) == 1 for s in blobs.values())
    assert len({next(iter(s)) for s in blobs.values()}) == 4  # distinct


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """With k greater than the number of distinct points, surplus
    clusters stay empty and keep their init centroid — no crash, no
    NaN."""
    vecs = {0: [0.0, 0.0], 1: [0.0, 0.0], 2: [100.0, 100.0]}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    assigned, cents = kmeans(df, k=3, iterations=3)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    want, want_cents = kmeans_py(vecs, k=3, iterations=3)
    assert got == want
    for c_spark, c_py in zip(cents, want_cents):
        assert max(abs(a - b) for a, b in zip(c_spark, c_py)) < 1e-9


def test_kmeans_small_inputs_clamp_k(spark):
    """ADVICE r04: an empty table returns an empty assignment (no
    TypeError on .first()), and n < k clamps k to n instead of
    IndexError-ing on the empty-cluster fallback."""
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assigned, cents = kmeans(empty, k=5, iterations=3)
    assert assigned.count() == 0
    assert cents == []
    got_py, cents_py = kmeans_py({}, k=5, iterations=3)
    assert got_py == {} and cents_py == []

    vecs = {0: [0.0, 1.0], 1: [9.0, 9.0]}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    assigned, cents = kmeans(df, k=7, iterations=3)
    got = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    want, want_cents = kmeans_py(vecs, k=7, iterations=3)
    assert got == want
    assert len(cents) == 2 == len(want_cents)
    for c_spark, c_py in zip(cents, want_cents):
        assert max(abs(a - b) for a, b in zip(c_spark, c_py)) < 1e-9

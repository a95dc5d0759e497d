"""Checkpoint/resume: versioned table snapshots per round (SURVEY.md C8).

The reference has no resume story (closest analog: append-mode CSV,
reference web_scraper.py:59-62). Here every round writes frontier,
seen, fetch-log and documents snapshots plus a manifest; a killed run
resumes from the last complete manifest bit-identically, because
nothing in the engine depends on wall clock or RNG (north rule).

Production shape: Iceberg table snapshots (append-only fetch_log,
snapshot-isolated frontier/seen) — the Iceberg runtime jar is not in
this sandbox, so the same semantics are implemented as versioned
parquet directories ``<dir>/round=<n>/<table>/`` with a JSON manifest
written LAST (the commit point; a crash mid-write leaves no manifest
and the round replays).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

TABLES = ("frontier", "seen", "fetch_log", "documents")


def save_round(
    base_dir: str,
    rnd: int,
    seq_counter: int,
    frontier: DataFrame,
    seen: DataFrame,
    fetch_log_cum: DataFrame,
    documents_cum: DataFrame,
    extra_manifest: dict | None = None,
) -> None:
    rd = os.path.join(base_dir, f"round={rnd}")
    frames = dict(frontier=frontier, seen=seen, fetch_log=fetch_log_cum, documents=documents_cum)
    for name in TABLES:
        frames[name].write.mode("overwrite").parquet(os.path.join(rd, name))
    manifest = {"round": rnd, "seq_counter": seq_counter, "tables": list(TABLES)}
    if extra_manifest:
        manifest.update({k: v for k, v in extra_manifest.items() if v is not None})
    tmp = os.path.join(rd, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(rd, "manifest.json"))  # atomic commit point


def load_latest(spark: SparkSession, base_dir: str):
    """Return (frontier, seen, fetch_log, documents, next_round,
    seq_counter) from the newest complete snapshot, or None."""
    if not base_dir or not os.path.isdir(base_dir):
        return None
    best = None
    for entry in os.listdir(base_dir):
        if not entry.startswith("round="):
            continue
        mpath = os.path.join(base_dir, entry, "manifest.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                m = json.load(f)
            if best is None or m["round"] > best["round"]:
                best = m
    if best is None:
        return None
    rd = os.path.join(base_dir, f"round={best['round']}")
    frames = {name: spark.read.parquet(os.path.join(rd, name)) for name in TABLES}
    return (
        frames["frontier"],
        frames["seen"],
        frames["fetch_log"],
        frames["documents"],
        best["round"] + 1,
        best["seq_counter"],
    )

"""Checkpoint/resume: versioned table snapshots per round (SURVEY.md C8).

The reference has no resume story (closest analog: append-mode CSV,
reference web_scraper.py:59-62). Here every round writes its state and
output increment plus a manifest; a killed run resumes from the last
complete manifest bit-identically, because nothing in the engine
depends on wall clock or RNG (north rule).

Layout per round (``<dir>/round=<n>/``):
- ``frontier/`` — full state snapshot (what the next round needs);
- ``seen/``, ``fetch_log/``, ``documents/`` — ROUND INCREMENTS only
  (append-only; rewriting cumulative tables each round would be O(R^2)
  I/O — this mirrors Iceberg's append snapshot; the seen set is
  delta-structured in the engine too);
- ``manifest.json`` written LAST via atomic rename (the commit point; a
  crash mid-write leaves no manifest and the round replays).

Production shape: Iceberg table snapshots (append-only fetch_log,
snapshot-isolated frontier/seen). The Iceberg runtime jar is not in
this sandbox, so the same semantics are parquet directories + manifest.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

STATE_TABLES = ("frontier",)
INC_TABLES = ("seen", "fetch_log", "documents")


def save_round(
    base_dir: str,
    rnd: int,
    seq_counter: int,
    frontier: DataFrame,
    seen: DataFrame,
    fetch_log_inc: DataFrame,
    documents_inc: DataFrame,
    extra_manifest: dict | None = None,
) -> None:
    rd = os.path.join(base_dir, f"round={rnd}")
    frames = dict(
        frontier=frontier, seen=seen, fetch_log=fetch_log_inc, documents=documents_inc
    )
    for name in STATE_TABLES + INC_TABLES:
        frames[name].write.mode("overwrite").parquet(os.path.join(rd, name))
    manifest = {
        "round": rnd,
        "seq_counter": seq_counter,
        "state_tables": list(STATE_TABLES),
        "increment_tables": list(INC_TABLES),
    }
    if extra_manifest:
        manifest.update({k: v for k, v in extra_manifest.items() if v is not None})
    tmp = os.path.join(rd, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(rd, "manifest.json"))  # atomic commit point


def _complete_rounds(base_dir: str) -> list[int]:
    out = []
    for entry in os.listdir(base_dir):
        if entry.startswith("round=") and os.path.exists(
            os.path.join(base_dir, entry, "manifest.json")
        ):
            out.append(int(entry.split("=", 1)[1]))
    return sorted(out)


def load_latest(spark: SparkSession, base_dir: str):
    """Return (frontier, seen, fetch_log_cum, documents_cum, next_round,
    seq_counter) from the newest complete snapshot chain, or None."""
    if not base_dir or not os.path.isdir(base_dir):
        return None
    rounds = _complete_rounds(base_dir)
    if not rounds:
        return None
    last = rounds[-1]
    with open(os.path.join(base_dir, f"round={last}", "manifest.json")) as f:
        manifest = json.load(f)
    rd = os.path.join(base_dir, f"round={last}")
    frontier = spark.read.parquet(os.path.join(rd, "frontier"))
    # cumulative views = union of every committed round increment
    seen = spark.read.parquet(*[os.path.join(base_dir, f"round={r}", "seen") for r in rounds])
    fetch_log = spark.read.parquet(
        *[os.path.join(base_dir, f"round={r}", "fetch_log") for r in rounds]
    )
    documents = spark.read.parquet(
        *[os.path.join(base_dir, f"round={r}", "documents") for r in rounds]
    )
    return (frontier, seen, fetch_log, documents, manifest["round"] + 1, manifest["seq_counter"])

"""Per-round fetch/parse metrics + per-partition lineage (north rule)."""

from __future__ import annotations

import json
import os

from ai4orgwebscraper_spark.frontier.engine import CrawlEngine
from ai4orgwebscraper_spark.sources.corpus import default_hosts, seed_urls


def test_round_metrics_and_manifest(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    engine = CrawlEngine(
        spark,
        hosts=default_hosts(),
        max_depth=1,
        max_rounds=3,
        checkpoint_dir=ckpt,
        collect_metrics=True,
    )
    out = engine.run(engine.seeds_from_list(seed_urls(30)))
    rm = out.metrics["round_metrics"]
    assert rm, "metrics must be collected per round"
    # per-host counts must reconcile with the fetch log
    total = sum(h["fetched"] for r in rm.values() for h in r["per_host"].values())
    assert total == out.fetch_log.count()
    first = next(iter(rm.values()))
    assert first["partitions"], "per-partition lineage recorded"
    some_host = next(iter(first["per_host"].values()))
    assert set(some_host) == {"fetched", "ok", "errors", "avg_latency_ms", "spans"}
    # metrics land in the committed manifest
    with open(os.path.join(ckpt, "round=0", "manifest.json")) as f:
        manifest = json.load(f)
    assert "metrics" in manifest and manifest["metrics"]["per_host"]

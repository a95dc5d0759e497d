#!/usr/bin/env python
"""spark-submit entry point for the crawl engine (north rule:
packaged for `spark-submit --py-files dist/ai4orgwebscraper_spark.zip`).

    spark-submit --master local[32] \
      --py-files dist/ai4orgwebscraper_spark.zip \
      scripts/run_crawl.py --seeds seeds.txt --out /tmp/crawl_out \
      --max-depth 1 --checkpoint /tmp/crawl_ckpt

Reads one URL per line from --seeds (no cap here — the 100-line cap is
the interactive ingestion contract, sources/seeds.py), runs the
multi-round frontier engine against the deterministic synthetic web,
and writes fetch_log/documents/seen parquet tables plus a metrics JSON.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", required=True, help="text file, one URL per line")
    ap.add_argument("--out", required=True)
    ap.add_argument("--max-depth", type=int, default=0)
    ap.add_argument("--max-rounds", type=int, default=50)
    ap.add_argument("--round-seconds", type=float, default=10.0)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--reference-mode", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from ai4orgwebscraper_spark import schemas
    from ai4orgwebscraper_spark.frontier.engine import CrawlEngine

    spark = SparkSession.builder.appName("run_crawl").getOrCreate()
    lines = spark.read.text(args.seeds)
    from pyspark.sql import functions as F

    seeds = (
        lines.select(F.trim("value").alias("url"))
        .filter(F.col("url") != "")
        .rdd.zipWithIndex()
        .map(lambda t: (t[1], t[0]["url"]))
    )
    seeds_df = spark.createDataFrame(seeds, schema=schemas.SEEDS)

    engine = CrawlEngine(
        spark,
        max_depth=args.max_depth,
        max_rounds=args.max_rounds,
        round_seconds=args.round_seconds,
        reference_mode=args.reference_mode,
        checkpoint_dir=args.checkpoint,
    )
    t0 = time.time()
    out = engine.run(seeds_df)
    out.fetch_log.write.mode("overwrite").parquet(f"{args.out}/fetch_log")
    out.documents.write.mode("overwrite").parquet(f"{args.out}/documents")
    out.seen.write.mode("overwrite").parquet(f"{args.out}/seen")
    engine.close()  # outputs are written; release spills + caches
    n = spark.read.parquet(f"{args.out}/fetch_log").count()
    metrics = dict(out.metrics, urls_fetched=n, wall_seconds=round(time.time() - t0, 2))
    with open(f"{args.out.rstrip('/')}_metrics.json", "w") as f:
        json.dump(metrics, f)
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    main()

"""applyInPandasWithState token-bucket admission vs its pure twin."""

from __future__ import annotations

import uuid

from ai4orgwebscraper_spark.streaming.stateful import admit_batch_reference, admit_stream


def test_stateful_admission_matches_reference_twin(spark, tmp_path):
    # deterministic request stream: bursts exceed the bucket, later
    # arrivals refill it
    rows = []
    for h in ("a.com", "b.com"):
        for i in range(30):
            rows.append((h, f"{h}-u{i:02d}", (i // 12) * 20_000 + (i % 12) * 10))
    src_dir = tmp_path / "req"
    spark.createDataFrame(rows, "host string, url_hash string, event_ms long").coalesce(
        1
    ).write.mode("overwrite").parquet(str(src_dir))

    stream = (
        spark.readStream.schema("host string, url_hash string, event_ms long")
        .parquet(str(src_dir))
    )
    name = "adm_" + uuid.uuid4().hex[:8]
    q = (
        admit_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        r["url_hash"]: (r["admitted"], r["tokens_after"])
        for r in spark.sql(f"SELECT * FROM {name}").collect()
    }
    want = {r["url_hash"]: (r["admitted"], r["tokens_after"]) for r in admit_batch_reference(rows)}
    assert got == want
    # the bucket actually bites: some requests deferred, some admitted
    assert any(a for a, _ in got.values()) and any(not a for a, _ in got.values())

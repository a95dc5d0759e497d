"""Seed ingestion caps + export/flatten semantics (SURVEY.md S2/S3, K1/K3)."""

from __future__ import annotations

import pytest

from ai4orgwebscraper_spark.sources.seeds import (
    SeedCapExceeded,
    export_results,
    flatten_for_csv,
    seeds_from_manual_entry,
    seeds_from_text_file,
)


def test_file_seeds_order_and_blank_skip(spark, tmp_path):
    p = tmp_path / "seeds.txt"
    p.write_text("http://a.com\n\n  \nb.com/x\nhttps://c.com\n")
    df = seeds_from_text_file(spark, str(p))
    rows = df.orderBy("seed_rank").collect()
    assert [(r["seed_rank"], r["url"]) for r in rows] == [
        (0, "http://a.com"),
        (1, "b.com/x"),
        (2, "https://c.com"),
    ]


def test_file_seed_cap_is_hard_error(spark, tmp_path):
    p = tmp_path / "big.txt"
    p.write_text("\n".join(f"https://h.com/{i}" for i in range(101)))
    with pytest.raises(SeedCapExceeded):
        seeds_from_text_file(spark, str(p))


def test_manual_seed_cap(spark):
    ok = seeds_from_manual_entry(spark, "\n".join(f"u{i}.com" for i in range(9)))
    assert ok.count() == 9
    with pytest.raises(SeedCapExceeded):
        seeds_from_manual_entry(spark, "\n".join(f"u{i}.com" for i in range(10)))


def test_flatten_for_csv(spark):
    df = spark.createDataFrame(
        [(1, {"a": 1, "b": "x"}, ["p", "q"], [{"k": "v"}])],
        "id long, s struct<a:int,b:string>, arr array<string>, nested array<struct<k:string>>",
    )
    flat = flatten_for_csv(df)
    row = flat.collect()[0]
    assert row["s_a"] == "1" and row["s_b"] == "x"
    assert row["arr"] == "p,q"
    assert '"k":"v"' in row["nested"]


def test_export_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, ["a", "b"]), (2, ["c"])], "id long, tags array<string>")
    written = export_results(df, str(tmp_path / "out"), formats=("parquet", "json", "csv"))
    back = spark.read.parquet(written["parquet"])
    assert back.count() == 2
    csv = spark.read.option("header", True).csv(written["csv"])
    assert {r["tags"] for r in csv.collect()} == {"a,b", "c"}
    js = spark.read.json(written["json"])
    assert js.count() == 2


def test_export_sectioned_txt(spark, tmp_path):
    """K3 TXT tail (reference app.py:413-424): one FIELD:\\n<value>
    section per column, blocks separated by blank lines, nested values
    as JSON."""
    df = spark.createDataFrame([(1, ["a", "b"], "x")], "id long, tags array<string>, note string")
    written = export_results(df, str(tmp_path / "out"), formats=("txt",))
    text = "\n".join(r["value"] for r in spark.read.text(written["txt"]).collect())
    assert "ID:\n1" in text
    assert 'TAGS:\n["a","b"]' in text
    assert "NOTE:\nx" in text


def test_reexported_schema_never_drifts(spark, tmp_path):
    """Unlike the reference's headerless CSV append (web_scraper.py:59-62),
    appends of a different shape must FAIL, not silently misalign."""
    out = str(tmp_path / "drift")
    df1 = spark.createDataFrame([(1, "t")], "url string, title string")
    df1.write.mode("overwrite").parquet(out)
    df2 = spark.createDataFrame([("u", "boom")], "url string, error string")
    df2.write.mode("append").parquet(out)
    merged = spark.read.option("mergeSchema", True).parquet(out)
    # parquet keeps both shapes distinguishable — no silent column misalignment
    assert set(merged.columns) == {"url", "title", "error"}


def test_seed_ranks_survive_repartition(spark, tmp_path):
    p = tmp_path / "many.txt"
    urls = [f"https://h{i % 7}.com/p/{i}" for i in range(100)]
    p.write_text("\n".join(urls))
    df = seeds_from_text_file(spark, str(p)).repartition(8)
    got = [r["url"] for r in df.orderBy("seed_rank").collect()]
    assert got == urls


def test_export_with_summary_sink(spark, tmp_path):
    """K2 sink shape: main table + Sum_ companion with the
    deterministic extractive summary (truncation marker included)."""
    from ai4orgwebscraper_spark.sources.seeds import (
        SUMMARY_MAX_TOKENS,
        export_with_summary,
    )

    rows = [
        ("d1", "short doc"),
        ("d2", " ".join(f"w{i}" for i in range(SUMMARY_MAX_TOKENS + 10))),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    written = export_with_summary(df, str(tmp_path / "out"), "doc_id", "text")
    summaries = {
        r["doc_id"]: (r["summary"], r["n_source_tokens"])
        for r in spark.read.parquet(written["summary"]).collect()
    }
    assert summaries["d1"] == ("short doc", 2)
    long_sum, n = summaries["d2"]
    assert n == SUMMARY_MAX_TOKENS + 10
    assert long_sum.endswith(" ...")
    assert long_sum.split(" ")[:3] == ["w0", "w1", "w2"]
    assert len(long_sum.split(" ")) == SUMMARY_MAX_TOKENS + 1  # + '...'
    # main table written alongside
    assert spark.read.parquet(written["parquet"]).count() == 2

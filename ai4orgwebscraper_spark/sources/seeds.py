"""Seed ingestion sources (SURVEY.md S2/S3) + export sinks (K1/K3).

Reproduces the reference's ingest contract: one URL per line, blanks
skipped, order preserved via explicit rank, hard caps enforced as
errors (file cap 100 — app_wrapper.py:129-133; manual cap 9 —
app_wrapper.py:143-147). Order preservation uses a line-number rank
computed distributedly, never partition iteration order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ai4orgwebscraper_spark import schemas

FILE_SEED_CAP = 100  # reference app_wrapper.py:129
MANUAL_SEED_CAP = 9  # reference app_wrapper.py:143


class SeedCapExceeded(ValueError):
    pass


def seeds_from_text_file(spark: SparkSession, path: str, cap: int = FILE_SEED_CAP) -> DataFrame:
    """One URL per line; blank lines skipped; >cap lines is a hard
    error (the reference refuses, not truncates)."""
    lines = (
        spark.read.text(path)
        .select(F.trim("value").alias("url"))
        .filter(F.col("url") != "")
    )
    n = lines.count()
    if n > cap:
        raise SeedCapExceeded(f"seed file has {n} URLs; cap is {cap}")
    # seed_rank = original line order; zipWithIndex preserves file order
    ranked = lines.rdd.zipWithIndex().map(lambda t: (t[1], t[0]["url"]))
    return spark.createDataFrame(ranked, schema=schemas.SEEDS)


def seeds_from_manual_entry(spark: SparkSession, text: str, cap: int = MANUAL_SEED_CAP) -> DataFrame:
    urls = [u.strip() for u in text.splitlines() if u.strip()]
    if len(urls) > cap:
        raise SeedCapExceeded(f"manual entry has {len(urls)} URLs; cap is {cap}")
    return spark.createDataFrame(list(enumerate(urls)), schema=schemas.SEEDS)


def export_results(df: DataFrame, out_dir: str, formats: tuple[str, ...] = ("parquet",)) -> dict:
    """Export sink (reference K3: JSON/CSV/TXT downloads, app.py:375-424)
    — schema-enforced table writes instead of the reference's
    header-drift CSV append (web_scraper.py:59-62). CSV/JSON flatten
    nested columns first (F20 dict-flatten, app.py:388-404)."""
    written = {}
    for fmt in formats:
        path = f"{out_dir}/{fmt}"
        if fmt == "parquet":
            df.write.mode("overwrite").parquet(path)
        elif fmt == "json":
            df.write.mode("overwrite").json(path)
        elif fmt == "csv":
            flat = flatten_for_csv(df)
            flat.write.mode("overwrite").option("header", True).csv(path)
        elif fmt == "txt":
            sectioned_txt(df).write.mode("overwrite").text(path)
        else:
            raise ValueError(f"unsupported format {fmt!r}")
        written[fmt] = path
    return written


def sectioned_txt(df: DataFrame) -> DataFrame:
    """Human-readable sectioned TXT (reference app.py:413-424: one
    `FIELD:\\n<json value>\\n\\n` block per field). One output line
    column per row; nested values render as JSON like the reference's
    json.dumps (compact, not indented — Spark's to_json has no indent
    mode; the section structure is what downstream consumers key on)."""
    blocks = []
    for field in df.schema.fields:
        t = field.dataType.typeName()
        val = (
            F.to_json(F.col(field.name))
            if t in ("struct", "array", "map")
            else F.col(field.name).cast("string")
        )
        blocks.append(
            F.concat(
                F.lit(field.name.upper() + ":\n"),
                F.coalesce(val, F.lit("null")),
                F.lit("\n"),
            )
        )
    return df.select(F.concat_ws("\n", *blocks).alias("value"))


def flatten_for_csv(df: DataFrame) -> DataFrame:
    """CSV-safe projection: structs expand to field_k columns, arrays
    join to comma strings (the reference's flatten, app.py:388-404)."""
    cols = []
    for field in df.schema.fields:
        t = field.dataType.typeName()
        if t == "struct":
            for sub in field.dataType.fields:
                cols.append(F.col(f"{field.name}.{sub.name}").cast("string").alias(f"{field.name}_{sub.name}"))
        elif t == "array":
            elem = field.dataType.elementType.typeName()
            if elem in ("struct", "array", "map"):
                cols.append(F.to_json(F.col(field.name)).alias(field.name))
            else:
                cols.append(F.array_join(F.col(field.name).cast("array<string>"), ",").alias(field.name))
        elif t == "map":
            cols.append(F.to_json(F.col(field.name)).alias(field.name))
        else:
            cols.append(F.col(field.name))
    return df.select(*cols)


SUMMARY_MAX_TOKENS = 24


def summary_col(text: Column) -> Column:
    """Deterministic extractive summary stub (K2's `Sum_` companion,
    reference app_wrapper.py:83-109): first SUMMARY_MAX_TOKENS
    whitespace tokens, '...' marker when truncated. The reference's
    gpt-4o rewrite (app_wrapper.py:44-80) is an external
    nondeterministic service — out of scope per SURVEY §7.4 — and
    would plug in here as an optional Arrow-batched pandas UDF with
    the identical column contract."""
    toks = F.split(F.trim(text), r"\s+")
    head = F.concat_ws(" ", F.slice(toks, 1, SUMMARY_MAX_TOKENS))
    return F.when(F.size(toks) > SUMMARY_MAX_TOKENS, F.concat(head, F.lit(" ..."))).otherwise(head)


def export_with_summary(
    df: DataFrame, out_dir: str, key_col: str, text_col: str
) -> dict:
    """K2 sink shape: the main table plus a `Sum_`-prefixed companion
    table of per-row summaries (reference writes <name>.txt and
    Sum_<name>.txt; here both are schema-enforced table writes)."""
    written = export_results(df, out_dir, formats=("parquet",))
    summaries = df.select(
        F.col(key_col),
        summary_col(F.col(text_col)).alias("summary"),
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")).alias("n_source_tokens"),
    )
    sum_path = f"{out_dir}/Sum_parquet"
    summaries.write.mode("overwrite").parquet(sum_path)
    written["summary"] = sum_path
    return written

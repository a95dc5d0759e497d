"""Plan-level helpers: scale-safe primitives and explain utilities."""

from ai4orgwebscraper_spark.plans.global_seq import with_global_seq  # noqa: F401

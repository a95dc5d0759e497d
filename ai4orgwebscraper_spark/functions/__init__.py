"""Scalar function library (SURVEY.md §2.6) — Spark built-ins first."""

"""Structured Streaming operators (engine extension; the reference is
pure batch — SURVEY.md §2.8 notes it has no streaming surface)."""

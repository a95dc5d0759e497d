"""Frontier engine: scheduler, fetch, seen-set, checkpoint (SURVEY.md §2.8)."""

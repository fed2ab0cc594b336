"""Structured Streaming jobs (SURVEY.md §2 B.10)."""

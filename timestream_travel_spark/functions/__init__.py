"""Scalar/array/vector/text function helpers (SURVEY.md §2 B.8, B.11)."""

"""Pipeline jobs: the reference-shaped backup/export (SURVEY.md §3)."""

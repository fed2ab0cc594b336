"""Source/sink connectors (SURVEY.md §2 B.1)."""

"""Structured Streaming operators (the reference is strictly batch —
SURVEY.md §2.2 'streaming' row)."""

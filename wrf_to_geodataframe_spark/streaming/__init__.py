"""Structured Streaming operators (SURVEY.md §2.8 streaming row)."""

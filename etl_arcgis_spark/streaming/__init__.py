"""Structured Streaming pipelines (SURVEY.md §2 C33-C38)."""

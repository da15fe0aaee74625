"""Structured Streaming surface over event tables (SURVEY.md §2.7)."""

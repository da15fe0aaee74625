"""Composite query pipelines (SURVEY.md §2.8 Q1-Q7 analogues)."""

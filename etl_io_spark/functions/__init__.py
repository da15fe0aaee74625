"""Scalar / cleaning functions (SURVEY.md §2.6) — all Catalyst expressions."""

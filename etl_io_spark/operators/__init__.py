"""Relational + extension operators, each a thin declarative layer over
pyspark.sql so Catalyst owns optimization (SURVEY.md §2, §4)."""

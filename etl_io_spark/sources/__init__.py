"""File / JDBC connectors and sinks (SURVEY.md §2.1)."""

"""Declared query surface: the oracle-checkable queries (SURVEY.md §2.3)
and the dashboard analytics module."""

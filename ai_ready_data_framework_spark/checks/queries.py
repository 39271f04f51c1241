"""Declared check-shaped queries (SURVEY.md §2.1 data-level checks).

Filled in milestone M2.
"""

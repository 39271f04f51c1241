"""Temporal / feature-store operators (SURVEY.md §2.2 J7, T1-T3, M3).

Filled in milestone M3.
"""

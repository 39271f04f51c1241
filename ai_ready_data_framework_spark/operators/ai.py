"""AI/LLM-training-data operators (SURVEY.md §2.2 L1-L8).

Filled in milestone M4.
"""

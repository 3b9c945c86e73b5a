"""Scalar / per-row transforms (SURVEY.md §2.2, P1-P12)."""

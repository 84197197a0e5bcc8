"""Scalar projection builders (P1-P11 from SURVEY.md §2.2)."""

"""Reusable dataflow operators — SURVEY.md §2's inventory, Spark-first."""

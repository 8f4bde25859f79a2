"""Operator implementations by family (SURVEY.md §2.A–§2.K)."""

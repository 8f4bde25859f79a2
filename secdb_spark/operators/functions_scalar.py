"""Placeholder — operators land in M2+ (SURVEY §7)."""

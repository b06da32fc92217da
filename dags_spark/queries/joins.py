"""SURVEY §2 — joins (to be filled in)."""

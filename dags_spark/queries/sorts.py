"""SURVEY §2 — sorts (to be filled in)."""

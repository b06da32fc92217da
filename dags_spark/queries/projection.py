"""SURVEY §2 — projection (to be filled in)."""

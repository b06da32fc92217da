"""SURVEY §2 — windows (to be filled in)."""

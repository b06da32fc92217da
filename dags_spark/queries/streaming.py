"""SURVEY §2 — streaming (to be filled in)."""

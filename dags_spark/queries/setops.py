"""SURVEY §2 — setops (to be filled in)."""

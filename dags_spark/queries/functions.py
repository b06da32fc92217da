"""SURVEY §2 — functions (to be filled in)."""

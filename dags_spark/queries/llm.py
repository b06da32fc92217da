"""SURVEY §2 — llm (to be filled in)."""

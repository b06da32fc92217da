"""Plan-quality tooling: lint physical plans for scale anti-patterns."""

from .lint import lint_plan, Finding

__all__ = ["lint_plan", "Finding"]

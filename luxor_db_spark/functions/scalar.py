"""Placeholder — filled in by category build-out (SURVEY.md §2)."""

"""Physical-plan inspection utilities (SURVEY.md §4 / M5)."""

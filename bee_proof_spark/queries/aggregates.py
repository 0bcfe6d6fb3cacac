"""Placeholder - filled in as SURVEY.md section 2 coverage lands."""

"""Operator inventory (SURVEY.md §2) as composable DataFrame operations."""

"""Dataflow operators (SURVEY.md §2), each a pure DataFrame transform."""

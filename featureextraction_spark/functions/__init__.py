"""Scalar/sequence function surface (SURVEY.md §2.2) and feature families."""

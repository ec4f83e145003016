"""Structured-Streaming analogs of the reference's continuous modes
(SURVEY.md §2.8 S-series)."""

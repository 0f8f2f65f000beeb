"""Structured Streaming surface over the events table (SURVEY.md §2.1:
absent in the reference — engine extension)."""

"""Structured Streaming surface (ingest-side; the reference itself is
strictly batch — SURVEY.md §2.6)."""

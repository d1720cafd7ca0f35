"""Structured Streaming surface: incremental corpus ingestion + streaming
aggregations (SURVEY.md §2.9 ST1–ST3)."""

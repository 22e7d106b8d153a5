"""Structured Streaming operators (SURVEY.md §2.7 — streaming).

Populated incrementally: windowed aggregations (tumbling/sliding/
session), watermarked late-data handling, streaming dedup, stateful
per-key processing.
"""

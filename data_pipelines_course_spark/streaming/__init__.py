"""Structured Streaming jobs — SURVEY §2.9 (T1-T4) upgraded from the
reference's DStream micro-batch model to incremental Catalyst plans."""

"""Batch source readers — SURVEY §2.1 mapped onto spark.read."""

"""Spark operator stages of the transcript-extraction engine."""

"""Structured Streaming mode (SURVEY §2.1 S9/S10, §2.6 T6)."""

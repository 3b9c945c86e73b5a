"""Structured-Streaming variants of the engine's operators (SURVEY §2.10)."""

"""Structured Streaming operators (event-window extension)."""

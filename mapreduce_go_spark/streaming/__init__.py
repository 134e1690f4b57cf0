"""Structured Streaming twins of the windowed batch operators."""

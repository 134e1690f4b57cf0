"""Operator/query implementations, one module per SURVEY §2 family."""

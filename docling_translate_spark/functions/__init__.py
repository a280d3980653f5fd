"""Scalar/string function helpers (SURVEY §2.9)."""

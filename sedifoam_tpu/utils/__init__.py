"""Utility helpers (post-processing, profiling)."""

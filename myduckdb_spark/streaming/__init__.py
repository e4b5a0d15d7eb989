"""Structured-Streaming variants of the core operators.

The reference is batch-only (SURVEY.md §2.10 — no stream machinery in its
tree), so everything here is additive: the same engine operators exposed
over unbounded input with watermarks and stateful processing.
"""

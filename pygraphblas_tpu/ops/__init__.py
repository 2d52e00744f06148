"""Operator semantic tables and kernel helpers."""

"""Operator modules; importing them registers queries (see registry)."""

"""Placeholder — queries added incrementally."""

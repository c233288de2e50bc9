"""Placeholder — populated incrementally (round 1)."""

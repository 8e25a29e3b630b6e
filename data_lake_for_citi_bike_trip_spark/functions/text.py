"""Placeholder — implemented in a later milestone this round."""

"""Exact scalar reference model of the pngloss optimizer (test oracle)."""

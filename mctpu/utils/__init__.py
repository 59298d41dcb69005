"""Utility layer: compensated accumulation, phase timing."""

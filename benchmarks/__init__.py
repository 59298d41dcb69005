"""Benchmark suite: BASELINE.json config sweep (see sweep.py)."""

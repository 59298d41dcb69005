"""CLI experiment drivers (L5), replacing the reference's interactive
``main()`` binaries ``vanillaOpt`` / ``basketOpt`` / ``cvaOpt``.

Each driver reproduces its reference experiment — same default market data,
CPU-oracle-vs-accelerator comparison, timing and speedup report — with
argparse flags replacing the reference's ``scanf`` sizing and compile-time
``#define`` grids (SURVEY.md §5 "Config / flag system").
"""
from mctpu.cli import common  # noqa: F401

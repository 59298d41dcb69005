"""Mesh construction for path-parallel Monte Carlo.

A 1-D mesh over all available devices with axis ``"paths"``; simulation
blocks are sharded over that axis.  Multi-host slices work unchanged: build
the mesh from ``jax.devices()`` after ``jax.distributed.initialize()`` and the
combine rides ICI/DCN through the same collectives.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["path_mesh", "initialize_distributed", "PATH_AXIS"]

PATH_AXIS = "paths"


def path_mesh(devices=None) -> Mesh:
    """1-D mesh over ``devices`` (default: all) with axis ``"paths"``."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (PATH_AXIS,))


def initialize_distributed(**kwargs) -> Mesh:
    """Multi-host entry: initialize jax.distributed, return the global mesh.

    On a multi-host slice (or multi-slice over DCN), call this once per
    process before any pricing; the returned mesh spans every chip in the
    job and every engine call shards over it unchanged — per-block counter
    RNG makes the result identical to a single-host run.  Pass-through
    kwargs go to ``jax.distributed.initialize`` (coordinator address etc.;
    all auto-detected on Cloud TPU).
    """
    jax.distributed.initialize(**kwargs)
    return path_mesh()

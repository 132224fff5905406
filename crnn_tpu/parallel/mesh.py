"""Device mesh utilities.

The reference is single-process Julia with zero parallelism (SURVEY.md §2.2
"Parallelism strategies": serial loops over experiments and SVGD
particles). The TPU-native scaling axis is data parallelism over
experiments x particles: a 1-D mesh, batch dims sharded over it, parameters
replicated, gradient/loss reductions via psum riding the ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host initialisation (one call per host before device use).

    Thin wrapper over ``jax.distributed.initialize``; on single-host TPU
    slices (v5e-8 and below) it is a no-op — the mesh sees all local chips
    directly. Arguments default to the standard env-var autodetection.
    """
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except (RuntimeError, ValueError):
        pass  # already initialised or single-process environment


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "exp") -> Mesh:
    """1-D mesh over the first n_devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def pad_to_multiple(x, multiple: int, axis: int = 0):
    """Zero-pad axis to a multiple (sharded batch dims must divide the mesh).

    Returns (padded, true_size); pair with a mask so padded lanes carry zero
    loss weight.
    """
    import jax.numpy as jnp

    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x, n
    pad_widths = [(0, 0)] * x.ndim
    pad_widths[axis] = (0, rem)
    return jnp.pad(x, pad_widths), n

"""Batch stiffness classification for static solver partitioning.

AutoSwitch (ode/autoswitch.py) pays both branches under ``vmap`` because
``lax.cond`` lowers to a select when batched. For batched TRAINING loops —
where the same experiments are re-solved every epoch — the TPU-first
pattern is to classify each lane ONCE up front and then run two statically
chosen solvers (explicit for the nonstiff group, a W-method/ESDIRK for the
stiff group), each in its own fully-utilised vmapped program with no dead
branch.

The probe: integrate each lane with the explicit solver under a tight step
budget. A lane whose stability limit forces dt far below the horizon
exhausts the budget (``success=False``) or burns anomalously many steps —
exactly the workloads the reference hands to stiff algorithms
(robertson/rober_crnn.jl:33, yeast_glycolysis.jl:33, Cathode
network.jl:102).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from crnn_tpu.ode.solve import odesolve
from crnn_tpu.ode.tsit5 import Tsit5


def classify_stiffness(
    rhs,
    u0_batch: jnp.ndarray,
    t0: float,
    t1: float,
    args: Any = None,
    rtol: float = 1e-3,
    atol: float = 1e-6,
    probe_steps: int = 256,
    dense_fraction: float = 0.75,
) -> jnp.ndarray:
    """Boolean mask (B,): True where the lane is stiff for an explicit RK.

    A lane is stiff when the Tsit5 probe cannot reach ``t1`` within
    ``probe_steps`` steps, or consumes more than ``dense_fraction`` of the
    budget — i.e. the explicit method is stability-limited, not
    accuracy-limited, on this horizon.

    Pass the TRAINING solve's ``rtol``/``atol`` so the probe's step-count
    reflects the real workload. Misclassification is conservative: an
    accuracy-limited (e.g. oscillatory/long-horizon) nonstiff lane that
    trips ``dense_fraction`` is merely routed to the implicit group —
    correct, just slower; no stiff lane can be routed to the explicit
    group unless the explicit probe actually finished within budget.
    """
    saveat = jnp.asarray([t1], u0_batch.dtype)

    def probe(u0):
        sol = odesolve(
            rhs, Tsit5(), u0, t0, t1, saveat, args=args,
            rtol=rtol, atol=atol, max_steps=probe_steps, unroll="while",
        )
        return sol.success, sol.n_steps

    ok, n_steps = jax.vmap(probe)(u0_batch)
    too_dense = n_steps >= jnp.asarray(int(dense_fraction * probe_steps),
                                       n_steps.dtype)
    return (~ok) | too_dense


def partition_by_stiffness(mask_stiff) -> tuple:
    """Host-side index split: (nonstiff_idx, stiff_idx) numpy arrays."""
    import numpy as np

    m = np.asarray(mask_stiff)
    return np.nonzero(~m)[0], np.nonzero(m)[0]

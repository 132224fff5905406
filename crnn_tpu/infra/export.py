"""Mechanism export: learned weights -> CSV tables.

Rebuilds the pruning scripts' ``weights.csv`` output
(/root/reference/case2/case2_pruning.jl:250-253,
case3/case3_pruning.jl:291-294): the physically-interpretable weight table
[w_in' | w_b | w_out'] (one row per reaction), for downstream mechanism
analysis.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def export_weights_csv(weights, path: str,
                       dydt_scale: Optional[np.ndarray] = None) -> np.ndarray:
    """Write [w_in.T | w_b | w_out.T] rows (one per reaction) to CSV.

    With dydt_scale, w_out is exported in physical units
    (w_out * dydt_scale, matching case3_pruning.jl's scaled export).
    Returns the exported table.
    """
    w_in = np.asarray(weights.w_in)
    w_b = np.asarray(weights.w_b)
    w_out = np.asarray(weights.w_out)
    if dydt_scale is not None:
        w_out = w_out * np.asarray(dydt_scale)[:, None]
    table = np.hstack([w_in.T[:, : w_out.shape[0]], w_b[:, None], w_out.T])
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savetxt(path, table, delimiter=",")
    return table


def export_gradient_blocks(grad: np.ndarray, ns: int, nr: int) -> str:
    """Pretty-print the w_out block of a raw gradient vector
    (display_grad, case3/case3.jl:75-83) for debugging mechanism search."""
    grad = np.asarray(grad)
    block = grad[nr * (ns + 1):nr * (2 * ns + 1)].reshape(ns, nr)
    out = "grad w_out (reaction rows):\n" + np.array2string(
        block.T, precision=6, suppress_small=True
    )
    print(out, flush=True)
    return out

"""Linear interpolation utilities (Interpolations.jl replacement).

The HyChem case interpolates T(t), P(t) and species profiles from raw
trajectory tables (/root/reference/HyChem/crnn_pyrolysis_mass.jl:44-51,
103-104). ``jnp.interp`` is jit/vmap/grad-safe; this module just wraps it
with a frozen-grid closure so the RHS captures static arrays.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp


def make_interpolant(xs: jnp.ndarray, ys: jnp.ndarray) -> Callable:
    """1-D linear interpolant f(x) with constant extrapolation at the ends."""
    xs = jnp.asarray(xs)
    ys = jnp.asarray(ys)

    def f(x):
        return jnp.interp(x, xs, ys)

    return f


def resample_log_grid(t_end: float, n: int, lo_frac: float = 1e-2,
                      hi_frac: float = 1.0 / 1.01, dtype=jnp.float64):
    """Log-spaced resampling grid with t[0] forced to 0
    (crnn_pyrolysis_mass.jl:42-43)."""
    ts = 10.0 ** jnp.linspace(
        jnp.log10(t_end * lo_frac), jnp.log10(t_end * hi_frac), n
    ).astype(dtype)
    return ts.at[0].set(0.0)

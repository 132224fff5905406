"""Synthetic dataset generation: vmapped truth solves + noise + scales.

Rebuilds the per-case data-generation loops (e.g. case2/case2.jl:61-83,
robertson/rober_crnn.jl:65-75) as ONE batched solve: all experiments
integrate simultaneously under ``vmap`` (each lane adapts its own steps),
then multiplicative Gaussian noise ``data * (1 + noise * randn)`` and the
per-species normalisation scales are computed exactly as the reference does.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from crnn_tpu.ode import Solver, odesolve


class Dataset(NamedTuple):
    u0: jnp.ndarray        # (n_exp, n_state) initial conditions
    ys: jnp.ndarray        # (n_exp, n_save, n_obs) noisy observations
    ys_clean: jnp.ndarray  # (n_exp, n_save, n_obs) noiseless truth
    ts: jnp.ndarray        # (n_save,)
    yscale: jnp.ndarray    # (n_obs,) global normalisation scale
    success: jnp.ndarray   # (n_exp,) truth-solve health


def max_min_scale(ys: jnp.ndarray, lb: float) -> jnp.ndarray:
    """Per-species (max - min) over time, max over experiments, + lb
    (case2/case2.jl:68-73,83). ys: (n_exp, n_save, ns)."""
    per_exp = ys.max(axis=1) - ys.min(axis=1)      # (n_exp, ns)
    return per_exp.max(axis=0) + lb


def std_scale(ys: jnp.ndarray, lb: float) -> jnp.ndarray:
    """Yeast variant: per-species std over time, max over experiments, + lb
    (yeast_glycolysis.jl:96-101)."""
    per_exp = ys.std(axis=1)
    return per_exp.max(axis=0) + lb


def latin_hypercube(key, n: int, d: int, dtype=jnp.float32) -> jnp.ndarray:
    """Integer Latin hypercube / n, matching the reference's
    ``randomLHC(n, d) ./ n`` usage (robertson/rober_crnn.jl:46):
    each column is an independent permutation of {1..n}/n."""
    keys = jax.random.split(key, d)
    cols = [jax.random.permutation(k, jnp.arange(1, n + 1)) for k in keys]
    return (jnp.stack(cols, axis=1) / n).astype(dtype)


def generate_dataset(
    key,
    rhs,
    solver: Solver,
    u0_list: jnp.ndarray,
    k: Any,
    t0,
    t1,
    saveat: jnp.ndarray,
    rtol,
    atol,
    noise: float,
    obs_dim: Optional[int] = None,
    scale_mode: str = "max_min",
    scale_lb: float = 0.0,
    max_steps: int = 16384,
) -> Dataset:
    """Solve the truth ODE for every experiment, add noise, compute scales.

    k may be shared (1-D) or per-experiment (2-D, leading n_exp).
    obs_dim truncates the state to the first ``obs_dim`` components before
    noise/scales (case2 drops the temperature row, case2/case2.jl:77).
    """
    n_exp = u0_list.shape[0]
    k_arr = jnp.asarray(k) if k is not None else jnp.zeros((n_exp, 0))
    if k_arr.ndim == 1:
        k_arr = jnp.broadcast_to(k_arr, (n_exp,) + k_arr.shape)

    def solve_one(u0, ki):
        sol = odesolve(
            rhs, solver, u0, t0, t1, saveat,
            args=ki, rtol=rtol, atol=atol, max_steps=max_steps, unroll="while",
        )
        return sol.ys, sol.success

    ys_clean, success = jax.vmap(solve_one)(u0_list, k_arr)
    if obs_dim is not None:
        ys_clean = ys_clean[..., :obs_dim]

    eps = jax.random.normal(key, ys_clean.shape, ys_clean.dtype)
    ys = ys_clean + eps * ys_clean * noise

    if scale_mode == "max_min":
        yscale = max_min_scale(ys, scale_lb)
    elif scale_mode == "std":
        yscale = std_scale(ys, scale_lb)
    elif scale_mode == "none":
        yscale = jnp.ones(ys.shape[-1], ys.dtype)
    else:
        raise ValueError(f"unknown scale_mode {scale_mode!r}")

    return Dataset(u0=u0_list, ys=ys, ys_clean=ys_clean, ts=saveat,
                   yscale=yscale, success=success)

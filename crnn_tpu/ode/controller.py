"""Step-size control: error norm, dt proposal, and initial-step heuristic.

Mirrors the adaptive behaviour the reference gets from
DifferentialEquations.jl (atol/rtol per case, per-species atol vectors —
/root/reference/robertson/rober_crnn.jl:34-35). Control decisions are
wrapped in ``stop_gradient`` by the caller: the step SEQUENCE is treated as
non-differentiable (the same semantics ForwardDiffSensitivity realises in
the reference), while the step MATH stays differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp


def error_norm(y_err, y0, y1, rtol, atol):
    """Hairer scaled RMS norm; accept iff <= 1. atol may be a vector."""
    scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    ratio = jnp.nan_to_num(y_err / scale, nan=jnp.inf, posinf=jnp.inf, neginf=jnp.inf)
    return jnp.sqrt(jnp.mean(ratio**2))


def propose_dt(dt, err, accept, order, safety=0.9, factor_min=0.2, factor_max=10.0):
    """I-controller with limiter: dt * clip(safety*err^(-1/(order+1)), ...).

    After a rejection the growth factor is capped at 1 (never grow dt on a
    failed step).
    """
    err = jnp.maximum(err, jnp.asarray(1e-10, dt.dtype))
    exponent = -1.0 / (order + 1.0)
    factor = safety * err**exponent
    fmax = jnp.where(accept, factor_max, 1.0)
    factor = jnp.clip(factor, factor_min, fmax)
    return dt * factor


def propose_dt_pi(dt, err, prev_err, accept, order, safety=0.9,
                  factor_min=0.2, factor_max=10.0,
                  beta1: float = 0.7, beta2: float = 0.4):
    """PI step controller (Gustafsson/H312-style):

        factor = safety * err^(-beta1/k) * prev_err^(beta2/k),  k = order+1

    Smoother dt sequences than the I-controller on mildly stiff problems
    (fewer rejections), matching OrdinaryDiffEq's default behaviour for
    its explicit pairs. Falls back to I-control after a rejection.
    Returns (dt_next, new_prev_err).
    """
    k = order + 1.0
    err = jnp.maximum(err, jnp.asarray(1e-10, dt.dtype))
    prev = jnp.maximum(prev_err, jnp.asarray(1e-10, dt.dtype))
    factor_pi = safety * err ** (-beta1 / k) * prev ** (beta2 / k)
    factor_i = safety * err ** (-1.0 / k)
    factor = jnp.where(accept, factor_pi, factor_i)
    fmax = jnp.where(accept, factor_max, 1.0)
    factor = jnp.clip(factor, factor_min, fmax)
    new_prev = jnp.where(accept, err, prev_err)
    return dt * factor, new_prev


def initial_step(f, t0, t1, y0, args, order, rtol, atol):
    """Hairer/Norsett/Wanner automatic initial step size (Solving ODEs I, II.4)."""
    dtype = y0.dtype
    scale = atol + rtol * jnp.abs(y0)
    f0 = f(t0, y0, args)
    d0 = jnp.sqrt(jnp.mean((y0 / scale) ** 2))
    d1 = jnp.sqrt(jnp.mean((f0 / scale) ** 2))
    small = jnp.asarray(1e-6, dtype)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), small, 0.01 * d0 / jnp.maximum(d1, 1e-30))
    h0 = jnp.minimum(h0, jnp.abs(t1 - t0))

    y1 = y0 + h0 * f0
    f1 = f(t0 + h0, y1, args)
    d2 = jnp.sqrt(jnp.mean(((f1 - f0) / scale) ** 2)) / jnp.maximum(h0, 1e-30)

    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(
        dmax <= 1e-15,
        jnp.maximum(small, h0 * 1e-3),
        (0.01 / jnp.maximum(dmax, 1e-30)) ** (1.0 / (order + 1.0)),
    )
    dt0 = jnp.minimum(100.0 * h0, h1)
    return jnp.minimum(dt0, jnp.abs(t1 - t0)).astype(dtype)

"""Compensated-f32 batch Rosenbrock23: double-f32 trajectory accumulation.

SURVEY.md §7 hard part 3: robertson must run in Float64 in the reference
(rober_crnn.jl:40) because y2 ~ 3.6e-5 rides on y1 ~ 1 over a 1e5-second
horizon. On TPU, f64 is double-float emulation of EVERY op (~10-35x);
the f32 experiment (runs/robertson_long/f32_experiment.md) showed a 10x
epoch win but a 1.4e-2 training-loss floor. The open question: is the
floor caused by trajectory ACCUMULATION error (y += dt*k over ~192
steps) — fixable by carrying the state as an unevaluated (hi, lo) f32
pair with two-sum accumulation, i.e. compensated summation applied ONLY
where the bits are lost — or by stage-math round-off (W-solve, stage
cancellations f1-k1 / f2-e32(k2-f1)-2(k1-f0)), which compensation cannot
reach without full double-float emulation?

This driver answers it: identical method/controller/dense-output to
``batch_odesolve_rb23`` (batch_solve.py), with the carry state held as
(y_hi, y_lo) and the step update ``y1 = y + dt*k2`` done in error-free
two-sum arithmetic. Stage math stays plain f32. If the floor persists
here, the deficit is stage-math precision; if it drops toward the f64
curve, accumulation was the bottleneck and the 10x win generalises.

Autonomous systems only (the robertson workload); gradients flow through
the compensated update (two-sum is piecewise linear — exact tangents
a.e.).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from crnn_tpu.ode.base import hermite_interp_matrix_from_endpoints
from crnn_tpu.ode.batch_solve import (BatchODESolution, _initial_step_batched,
                                      _lane_norm)
from crnn_tpu.ode.controller import propose_dt
from crnn_tpu.ode.linsolve import inv_small_nopivot_minpiv, pivot_ok

_D = 1.0 / (2.0 + math.sqrt(2.0))
_E32 = 6.0 + math.sqrt(2.0)

_RUNNING = 0
_DONE = 1
_FAILED = 2


def two_sum(a, b):
    """Error-free transform: a + b = s + e exactly (Knuth/Møller)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


class _CompCarry(NamedTuple):
    t: jnp.ndarray
    y_hi: jnp.ndarray
    y_lo: jnp.ndarray
    dt: jnp.ndarray
    ys: jnp.ndarray
    status: jnp.ndarray
    n_steps: jnp.ndarray


def batch_odesolve_rb23_comp(
    f,
    f_jac,
    y0: jnp.ndarray,
    t0,
    t1,
    saveat: jnp.ndarray,
    args: Any = None,
    rtol=1e-3,
    atol=1e-6,
    dt0: Optional[jnp.ndarray] = None,
    max_steps: int = 4096,
    safety: float = 0.9,
    factor_min: float = 0.2,
    factor_max: float = 10.0,
    dtmin_frac: float = 1e-12,
) -> BatchODESolution:
    """batch_odesolve_rb23 with compensated (hi, lo) state accumulation."""
    dtype = jnp.result_type(y0.dtype)
    y0 = jnp.asarray(y0, dtype)
    b, ns = y0.shape
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)
    saveat = jnp.asarray(saveat, dtype)
    rtol = jnp.asarray(rtol, dtype)
    atol = jnp.asarray(atol, dtype)
    dtmin = dtmin_frac * (t1 - t0)
    order = 2

    if dt0 is None:
        dt_init = _initial_step_batched(f, t0, t1, y0, args, order, rtol, atol)
    else:
        dt_init = jnp.broadcast_to(jnp.asarray(dt0, dtype), (b,))
    dt_init = jax.lax.stop_gradient(dt_init)

    ys0 = jnp.where((saveat <= t0)[None, :, None], y0[:, None, :],
                    jnp.zeros((b, saveat.shape[0], ns), dtype))

    carry0 = _CompCarry(
        t=jnp.full((b,), t0, dtype),
        y_hi=y0,
        y_lo=jnp.zeros_like(y0),
        dt=dt_init,
        ys=ys0,
        status=jnp.zeros((b,), jnp.int32),
        n_steps=jnp.zeros((b,), jnp.int32),
    )

    eye = jnp.eye(ns, dtype=dtype)
    batched_inv = jax.vmap(inv_small_nopivot_minpiv)

    def body(s: _CompCarry) -> _CompCarry:
        running = s.status == _RUNNING
        t_rem = t1 - s.t
        clipped = s.dt >= t_rem
        dt = jnp.where(running, jnp.minimum(s.dt, t_rem), s.dt)
        dt = jnp.maximum(dt, jnp.asarray(0.0, dtype))

        # evaluate at the best f32 rounding of the (hi, lo) state
        y = s.y_hi + s.y_lo
        hd = dt * _D
        f0, jac = f_jac(s.t, y, args)
        w = eye[None] - hd[:, None, None] * jac
        w_inv_raw, min_piv = batched_inv(w)
        piv_good = pivot_ok(w, min_piv)
        w_inv = jnp.clip(jnp.nan_to_num(w_inv_raw, nan=0.0,
                                        posinf=1e18, neginf=-1e18),
                         -1e18, 1e18)

        def wsolve(v):
            return jnp.einsum("bij,bj->bi", w_inv, v)

        k1 = wsolve(f0)
        f1 = f(s.t + 0.5 * dt, y + (0.5 * dt)[:, None] * k1, args)
        k2 = wsolve(f1 - k1) + k1
        # ---- compensated state update: y1 = y + dt*k2 exactly ------------
        inc = dt[:, None] * k2
        s_hi, e = two_sum(s.y_hi, inc)
        lo_acc = s.y_lo + e
        y1_hi, y1_lo = two_sum(s_hi, lo_acc)     # renormalise the pair
        y1 = y1_hi + y1_lo
        f2 = f(s.t + dt, y1, args)
        k3 = wsolve(f2 - _E32 * (k2 - f1) - 2.0 * (k1 - f0))
        y_err = (dt / 6.0)[:, None] * (k1 - 2.0 * k2 + k3)

        ok = (jnp.all(jnp.isfinite(y1), axis=-1)
              & jnp.all(jnp.isfinite(y_err), axis=-1)
              & jax.lax.stop_gradient(piv_good))
        err = jax.lax.stop_gradient(_lane_norm(y_err, y, y1, rtol, atol))
        err = jnp.where(ok, err, jnp.inf)
        accept = err <= 1.0
        t_new = s.t + dt

        theta = jnp.clip((saveat[None, :] - s.t[:, None])
                         / jnp.maximum(dt, 1e-30)[:, None], 0.0, 1.0)
        bmat = hermite_interp_matrix_from_endpoints(theta).astype(dtype)
        dense = jnp.stack([f0, f2, (y1 - y) / dt[:, None]], axis=1)
        y_interp = y[:, None, :] + dt[:, None, None] * jnp.einsum(
            "bsk,bkn->bsn", bmat, dense)
        y_interp = jnp.where(jnp.isfinite(y_interp), y_interp,
                             jnp.zeros_like(y_interp))
        fill = (running & accept)[:, None] & (
            (saveat[None, :] > s.t[:, None]) & (saveat[None, :] <= t_new[:, None]))
        ys = jnp.where(fill[:, :, None], y_interp, s.ys)

        dt_next = jax.lax.stop_gradient(
            propose_dt(dt, err, accept, order, safety, factor_min, factor_max))
        adv = running & accept

        finished = accept & clipped
        too_small = dt_next < dtmin
        new_status = jnp.where(
            finished, _DONE, jnp.where(too_small, _FAILED, _RUNNING)
        ).astype(jnp.int32)

        hi_safe = jnp.where(jnp.isfinite(y1_hi), y1_hi, jnp.zeros_like(y1_hi))
        lo_safe = jnp.where(jnp.isfinite(y1_lo), y1_lo, jnp.zeros_like(y1_lo))
        return _CompCarry(
            t=jnp.where(adv, jax.lax.stop_gradient(t_new), s.t),
            y_hi=jnp.where(adv[:, None], hi_safe, s.y_hi),
            y_lo=jnp.where(adv[:, None], lo_safe, s.y_lo),
            dt=jnp.where(running, dt_next, s.dt),
            ys=ys,
            status=jnp.where(running, new_status, s.status),
            n_steps=s.n_steps + running.astype(jnp.int32),
        )

    remat_body = jax.checkpoint(body)

    def scan_body(s, _):
        return remat_body(s), None

    final, _ = jax.lax.scan(scan_body, carry0, None, length=max_steps)

    return BatchODESolution(
        ts=saveat,
        ys=final.ys,
        success=final.status == _DONE,
        n_steps=final.n_steps,
        final_t=final.t,
        final_y=final.y_hi + final.y_lo,
    )

"""Batch-major adaptive Rosenbrock23: whole-batch RHS/Jacobian evaluation.

The per-lane driver (``ode/solve.py``) under ``jax.vmap`` lets XLA batch
the stage math, but every RHS/Jacobian evaluation is still expressed as a
chain of separate ops. This driver inverts the layout: the integration
loop itself is batch-major — the carry is (B, ...) — and each step issues
ONE fused evaluation of the whole lane batch through the Pallas CRNN
kernels (``ops/crnn_kernels.py``): value + analytic Jacobian share the
``rates`` matmul, and the log -> matmul -> exp -> matmul chain runs as a
single VMEM-resident kernel. This realises SURVEY.md §7 step 6 (fused
RHS+Jacobian inside the implicit solver's W step) for the hottest
function in every workload (case2/case2.jl:114-118).

Semantics match ``odesolve`` + ``Rosenbrock23``: Shampine 2(3) W-method,
per-lane I-controller with stop-gradient step decisions, cubic-Hermite
``saveat`` dense output, status masking for finished/failed lanes.

Non-autonomous systems (round 5): pass ``nonautonomous=True`` and have
``f_jac`` additionally return ``ft = df/dt (B, ns)``; the driver then adds
Shampine's ``dt*d*ft`` term to the k1/k3 stage RHS exactly as the per-lane
``Rosenbrock23.step`` does (rosenbrock.py:82-88). This lifts the round-4
autonomous-only restriction so the temperature-ramp Cathode family
(Cathode/src/network.jl:60-80 — T(t) = T0 + beta/60*t enters the rates,
df/dt != 0) can run batch-major: the 100-particle SVGD likelihood becomes
one fused whole-ensemble evaluation per solver step instead of 100
per-lane solves (UQ network.jl:227 evaluates particles serially).

Interface: ``f(t (B,), y (B, ns), args) -> (B, ns)`` and
``f_jac(t, y, args) -> (du (B, ns), J (B, ns, ns))`` — plus a trailing
``ft (B, ns)`` element when ``nonautonomous=True``.

Low-rank mode (``jac_mode='lowrank'``): the CRNN Jacobian is EXACTLY
rank-nr — J = U @ V with U = w_out (ns x nr, shared across lanes and
steps) and V[b] = diag(rates[b]) @ d(features)/dy — so the Rosenbrock W
solve uses the Woodbury identity

    (I - h*d*U V)^-1 v = v + h*d * U (I_nr - h*d* V U)^-1 V v

replacing the dense (ns+1)x(ns+1) Gauss-Jordan per step with an nr x nr
(3x3 for case2) inner inverse plus small batched matmuls. At nr < ns this
is the speed-of-light formulation for the implicit step on any hardware;
on TPU every piece is a batched small matmul. ``f_jac`` then returns
``(du, U (ns, nr), V (B, nr, ns))``.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from crnn_tpu.ode.base import hermite_interp_matrix_from_endpoints
from crnn_tpu.ode.controller import propose_dt
from crnn_tpu.ode.linsolve import inv_small_nopivot_minpiv, pivot_ok

_D = 1.0 / (2.0 + math.sqrt(2.0))
_E32 = 6.0 + math.sqrt(2.0)

_RUNNING = 0
_DONE = 1
_FAILED = 2


class BatchODESolution(NamedTuple):
    ts: jnp.ndarray       # (n_save,)
    ys: jnp.ndarray       # (B, n_save, ns)
    success: jnp.ndarray  # (B,) bool
    n_steps: jnp.ndarray  # (B,)
    final_t: jnp.ndarray  # (B,)
    final_y: jnp.ndarray  # (B, ns)


class _Carry(NamedTuple):
    t: jnp.ndarray        # (B,)
    y: jnp.ndarray        # (B, ns)
    dt: jnp.ndarray       # (B,)
    ys: jnp.ndarray       # (B, n_save, ns)
    status: jnp.ndarray   # (B,) int32
    n_steps: jnp.ndarray  # (B,) int32


def _lane_norm(err, y0, y1, rtol, atol):
    """Per-lane Hairer scaled RMS norm over the species axis."""
    scale = atol + rtol * jnp.maximum(jnp.abs(y0), jnp.abs(y1))
    ratio = jnp.nan_to_num(err / scale, nan=jnp.inf, posinf=jnp.inf,
                           neginf=jnp.inf)
    return jnp.sqrt(jnp.mean(ratio**2, axis=-1))


def _initial_step_batched(f, t0, t1, y0, args, order, rtol, atol):
    """Hairer automatic h0, vectorised over lanes (controller.py analogue)."""
    dtype = y0.dtype
    b = y0.shape[0]
    t0v = jnp.full((b,), t0, dtype)
    scale = atol + rtol * jnp.abs(y0)
    f0 = f(t0v, y0, args)
    d0 = jnp.sqrt(jnp.mean((y0 / scale) ** 2, axis=-1))
    d1 = jnp.sqrt(jnp.mean((f0 / scale) ** 2, axis=-1))
    small = jnp.asarray(1e-6, dtype)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), small,
                   0.01 * d0 / jnp.maximum(d1, 1e-30))
    h0 = jnp.minimum(h0, jnp.abs(t1 - t0))
    y1 = y0 + h0[:, None] * f0
    f1 = f(t0v + h0, y1, args)
    d2 = jnp.sqrt(jnp.mean(((f1 - f0) / scale) ** 2, axis=-1)) / jnp.maximum(
        h0, 1e-30)
    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(
        dmax <= 1e-15,
        jnp.maximum(small, h0 * 1e-3),
        (0.01 / jnp.maximum(dmax, 1e-30)) ** (1.0 / (order + 1.0)),
    )
    return jnp.minimum(jnp.minimum(100.0 * h0, h1),
                       jnp.abs(t1 - t0)).astype(dtype)


def batch_odesolve_rb23(
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
    unroll: str = "scan",
    safety: float = 0.9,
    factor_min: float = 0.2,
    factor_max: float = 10.0,
    dtmin_frac: float = 1e-12,
    jac_mode: str = "dense",
    nonautonomous: bool = False,
) -> BatchODESolution:
    """Integrate all B lanes from t0 to t1 with one fused f/J per step."""
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

    carry0 = _Carry(
        t=jnp.full((b,), t0, dtype),
        y=y0,
        dt=dt_init,
        ys=ys0,
        status=jnp.zeros((b,), jnp.int32),
        n_steps=jnp.zeros((b,), jnp.int32),
    )

    # pivot-free: W/M are near-identity within the stability envelope, and
    # the pivoted variant's traced-permutation gather transposes to a
    # scatter-add that dominated the training epoch (runs/profile)
    eye = jnp.eye(ns, dtype=dtype)
    batched_inv = jax.vmap(inv_small_nopivot_minpiv)

    def body(s: _Carry) -> _Carry:
        running = s.status == _RUNNING
        t_rem = t1 - s.t
        clipped = s.dt >= t_rem
        dt = jnp.where(running, jnp.minimum(s.dt, t_rem), s.dt)
        dt = jnp.maximum(dt, jnp.asarray(0.0, dtype))

        # ---- one fused whole-batch value+Jacobian evaluation -------------
        hd = dt * _D
        if jac_mode == "lowrank":
            jac_out = f_jac(s.t, s.y, args)   # (B,ns),(ns,nr),(B,nr,ns)[,ft]
            f0, u_fac, v_fac = jac_out[:3]
            nr = u_fac.shape[1]
            # inner matrix M = I_nr - h*d * V U, shared by all three solves
            m = jnp.eye(nr, dtype=dtype)[None] - hd[:, None, None] * jnp.einsum(
                "brj,jq->brq", v_fac, u_fac)
            m_inv_raw, min_piv = batched_inv(m)
            piv_good = pivot_ok(m, min_piv)  # (B,) — ADVICE r3 guard
            m_inv = jnp.clip(jnp.nan_to_num(m_inv_raw, nan=0.0,
                                            posinf=1e18, neginf=-1e18),
                             -1e18, 1e18)

            def wsolve(v):  # Woodbury: v + h*d*U M^-1 V v
                s_r = jnp.einsum("brj,bj->br", v_fac, v)
                return v + hd[:, None] * jnp.einsum(
                    "jq,bq->bj", u_fac, jnp.einsum("bqr,br->bq", m_inv, s_r))
        else:
            jac_out = f_jac(s.t, s.y, args)
            f0, jac = jac_out[:2]
            w = eye[None] - hd[:, None, None] * jac
            w_inv_raw, min_piv = batched_inv(w)
            piv_good = pivot_ok(w, min_piv)  # (B,) — ADVICE r3 guard
            w_inv = jnp.clip(jnp.nan_to_num(w_inv_raw, nan=0.0,
                                            posinf=1e18, neginf=-1e18),
                             -1e18, 1e18)

            def wsolve(v):  # (B, ns)
                return jnp.einsum("bij,bj->bi", w_inv, v)

        if nonautonomous:
            # Shampine dt*d*ft stage term (rosenbrock.py:82-88); f_jac's
            # trailing element is the analytic/jvp df/dt for the batch
            dtd_ft = hd[:, None] * jac_out[-1]
        else:
            dtd_ft = 0.0

        k1 = wsolve(f0 + dtd_ft)
        f1 = f(s.t + 0.5 * dt, s.y + (0.5 * dt)[:, None] * k1, args)
        k2 = wsolve(f1 - k1) + k1
        y1 = s.y + dt[:, None] * k2
        f2 = f(s.t + dt, y1, args)
        k3 = wsolve(f2 - _E32 * (k2 - f1) - 2.0 * (k1 - f0) + dtd_ft)
        y_err = (dt / 6.0)[:, None] * (k1 - 2.0 * k2 + k3)

        # piv_good: a near-zero no-pivot diagonal yields a finite-but-wrong
        # inverse AND error estimate — reject the lane's step outright
        ok = (jnp.all(jnp.isfinite(y1), axis=-1)
              & jnp.all(jnp.isfinite(y_err), axis=-1)
              & jax.lax.stop_gradient(piv_good))
        err = jax.lax.stop_gradient(_lane_norm(y_err, s.y, y1, rtol, atol))
        err = jnp.where(ok, err, jnp.inf)
        accept = err <= 1.0
        t_new = s.t + dt

        # ---- dense saveat fill over (t, t_new] per lane -------------------
        theta = jnp.clip((saveat[None, :] - s.t[:, None])
                         / jnp.maximum(dt, 1e-30)[:, None], 0.0, 1.0)
        bmat = hermite_interp_matrix_from_endpoints(theta).astype(dtype)
        dense = jnp.stack([f0, f2, (y1 - s.y) / dt[:, None]], axis=1)
        y_interp = s.y[:, None, :] + dt[:, None, None] * jnp.einsum(
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

        y1_safe = jnp.where(jnp.isfinite(y1), y1, jnp.zeros_like(y1))
        return _Carry(
            t=jnp.where(adv, jax.lax.stop_gradient(t_new), s.t),
            y=jnp.where(adv[:, None], y1_safe, s.y),
            dt=jnp.where(running, dt_next, s.dt),
            ys=ys,
            status=jnp.where(running, new_status, s.status),
            n_steps=s.n_steps + running.astype(jnp.int32),
        )

    if unroll == "while":
        final = jax.lax.while_loop(
            lambda s: jnp.any((s.status == _RUNNING) & (s.n_steps < max_steps)),
            body,
            carry0,
        )
    elif unroll == "scan":
        remat_body = jax.checkpoint(body)

        def scan_body(s, _):
            return remat_body(s), None

        final, _ = jax.lax.scan(scan_body, carry0, None, length=max_steps)
    else:
        raise ValueError(f"unknown unroll mode: {unroll!r}")

    return BatchODESolution(
        ts=saveat,
        ys=final.ys,
        success=final.status == _DONE,
        n_steps=final.n_steps,
        final_t=final.t,
        final_y=final.y,
    )

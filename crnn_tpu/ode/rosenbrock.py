"""Rosenbrock23: Shampine's 2(3) Rosenbrock W-method for stiff systems.

TPU-native replacement for the reference's ``Rosenbrock23(autodiff=true)``
(/root/reference/robertson/rober_crnn.jl:33) and the stiff half of
``AutoTsit5(Rosenbrock23(...))`` (case2/case2.jl:26).

Method (Shampine & Reichelt 1997, the ode23s scheme):

    d  = 1/(2 + sqrt(2)),  W = I - dt*d*J,   J = df/dy at (t, y)
    k1 = W^-1 (f0 + dt*d*ft)
    f1 = f(t + dt/2, y + dt/2 * k1)
    k2 = W^-1 (f1 - k1) + k1
    y1 = y + dt*k2
    f2 = f(t + dt, y1)
    k3 = W^-1 (f2 - e32*(k2 - f1) - 2*(k1 - f0) + dt*d*ft),  e32 = 6 + sqrt(2)
    err = dt/6 * (k1 - 2 k2 + k3)

The Jacobian is exact via ``jax.jacfwd`` (the reference relies on
ForwardDiff dual numbers inside DifferentialEquations.jl for the same
purpose). Species counts are tiny (ns <= 12), so the three W-solves share a
single LU factorisation; under ``vmap`` XLA lowers this to batched small
LU — the batch dimension (experiments x particles) provides parallelism.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

from crnn_tpu.ode.base import RHS, Solver, StepResult, hermite_interp_matrix_from_endpoints
from crnn_tpu.ode.linsolve import inv_small_nopivot_minpiv, pivot_ok

_D = 1.0 / (2.0 + math.sqrt(2.0))
_E32 = 6.0 + math.sqrt(2.0)


class Rosenbrock23(Solver):
    """Adaptive 2(3) Rosenbrock-W method.

    The Jacobian defaults to exact forward-mode AD; pass ``jac(t, y, args)``
    to use a closed form (e.g. the analytic CRNN Jacobian in
    ``crnn_tpu.models.jacobian``) — W-methods tolerate approximate J.
    """

    order = 2
    n_stages = 3  # Hermite dense: [f0, f_end, (y1-y0)/dt]
    implicit = True

    def __init__(self, jac=None):
        self.jac = jac

    def init(self, f: RHS, t0, y0, args) -> Any:
        return f(t0, y0, args)  # slope at (t, y): reused as f0 (FSAL-like)

    def step(self, f: RHS, t, y, dt, args, state) -> StepResult:
        f0 = state
        dtype = y.dtype

        if self.jac is not None:
            jac = self.jac(t, y, args)
        else:
            jac = jax.jacfwd(lambda yy: f(t, yy, args))(y)
        # non-autonomous term df/dt (zero for autonomous RHS; needed for
        # temperature-ramp models like Cathode, network.jl:60-65)
        ft = jax.jvp(lambda tt: f(tt, y, args), (t,), (jnp.ones((), dtype),))[1]

        eye = jnp.eye(y.shape[-1], dtype=dtype)
        w = eye - (dt * _D) * jac
        # clamp the inverse: near-singular W from a huge trial dt must not
        # inject inf into the (rejected) step's gradient graph
        w_inv_raw, min_piv = inv_small_nopivot_minpiv(w)
        w_inv = jnp.clip(jnp.nan_to_num(w_inv_raw, nan=0.0,
                                        posinf=1e18, neginf=-1e18),
                         -1e18, 1e18)

        def wsolve(b):
            return w_inv @ b

        dtd_ft = (dt * _D) * ft
        k1 = wsolve(f0 + dtd_ft)
        f1 = f(t + 0.5 * dt, y + (0.5 * dt) * k1, args)
        k2 = wsolve(f1 - k1) + k1
        y1 = y + dt * k2
        f2 = f(t + dt, y1, args)
        k3 = wsolve(f2 - _E32 * (k2 - f1) - 2.0 * (k1 - f0) + dtd_ft)
        y_err = (dt / 6.0) * (k1 - 2.0 * k2 + k3)

        dense = jnp.stack([f0, f2, (y1 - y) / dt])
        # pivot_ok: the no-pivot inverse can be finite-but-wrong when a
        # diagonal pivot of W crosses ~0 — force rejection (ADVICE r3)
        ok = (jnp.all(jnp.isfinite(y1)) & jnp.all(jnp.isfinite(y_err))
              & pivot_ok(w, min_piv))
        return StepResult(y1=y1, y_err=y_err, dense=dense, state=f2, ok=ok)

    def interp_matrix(self, theta: jnp.ndarray) -> jnp.ndarray:
        return hermite_interp_matrix_from_endpoints(theta)

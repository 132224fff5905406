"""ESDIRK stiff solvers: TRBDF2 and Kvaerno3 with batched simplified Newton.

TPU-native replacement for the reference's ``TRBDF2(autodiff=true)``
(/root/reference/yeast-glycolysis/yeast_glycolysis.jl:33,
Cathode/src/network.jl:102). ESDIRK methods have an explicit first stage
(slope at (t, y), FSAL-reusable) and implicit stages that all share the
same diagonal coefficient, so ONE Jacobian + ONE LU factorisation per step
serves every stage's simplified-Newton iteration.

Under ``vmap`` each batch lane runs its own Newton iterations on its own
(ns x ns) LU — XLA lowers to batched small solves. A fixed iteration count
(static shape) with a convergence check keeps the loop jit-compatible;
non-converged lanes report ``ok=False`` and the driver retries the step
with a smaller dt.
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from crnn_tpu.ode.base import RHS, Solver, StepResult, hermite_interp_matrix_from_endpoints
from crnn_tpu.ode.linsolve import inv_small_nopivot_minpiv, pivot_ok


class ESDIRKTableau(NamedTuple):
    a: tuple          # full lower-triangular matrix rows, a[i][j]
    c: tuple          # stage times
    b_err: tuple      # (b - bhat) error weights
    gamma: float      # shared diagonal coefficient of implicit stages
    order: int


def _trbdf2_tableau() -> ESDIRKTableau:
    # Hosea & Shampine (1996): gamma = 2 - sqrt(2), d = gamma/2, w = sqrt(2)/4.
    g = 2.0 - math.sqrt(2.0)
    d = g / 2.0
    w = math.sqrt(2.0) / 4.0
    a = (
        (0.0, 0.0, 0.0),
        (d, d, 0.0),
        (w, w, d),  # stiffly accurate: b == last row
    )
    c = (0.0, g, 1.0)
    # bhat = [(1-w)/3, (3w+1)/3, d/3]  =>  b - bhat:
    b_err = ((4.0 * w - 1.0) / 3.0, -1.0 / 3.0, 2.0 * d / 3.0)
    return ESDIRKTableau(a=a, c=c, b_err=b_err, gamma=d, order=2)


def _kvaerno3_tableau() -> ESDIRKTableau:
    # Kvaerno (2004) ESDIRK 4/3 with gamma = 0.435866521508459.
    # Row 3 (c3 = 1) is the 2nd-order embedded method; row 4 solves the
    # third-order conditions  sum(b)=1, sum(b*c)=1/2, sum(b*c^2)=1/3:
    g = 0.435866521508459
    a31 = (-4.0 * g * g + 6.0 * g - 1.0) / (4.0 * g)
    a32 = (-2.0 * g + 1.0) / (4.0 * g)
    a42 = 1.0 / (12.0 * g * (1.0 - 2.0 * g))
    a43 = 0.5 - g - 2.0 * g * a42
    a41 = 1.0 - g - a42 - a43
    a = (
        (0.0, 0.0, 0.0, 0.0),
        (g, g, 0.0, 0.0),
        (a31, a32, g, 0.0),
        (a41, a42, a43, g),  # stiffly accurate
    )
    c = (0.0, 2.0 * g, 1.0, 1.0)
    # embedded 2nd order bhat = row 3: [a31, a32, g, 0]
    b_err = (a41 - a31, a42 - a32, a43 - g, g)
    return ESDIRKTableau(a=a, c=c, b_err=b_err, gamma=g, order=3)


class ESDIRK(Solver):
    """Generic stiffly-accurate ESDIRK with simplified Newton stage solves."""

    implicit = True
    n_stages = 3  # Hermite dense: [f0, f_end, (y1-y0)/dt]

    def __init__(self, tableau: ESDIRKTableau, max_newton_iters: int = 8,
                 newton_rtol: float = 1e-7, newton_atol: float = 1e-10,
                 jac=None):
        # Newton tolerances must stay achievable on TPU's double-float f64
        # emulation (~1e-15 per-op, less through matvec chains): demanding
        # 1e-9 relative increments makes convergence unreachable there, so
        # every step rejects and dt collapses.
        self.tab = tableau
        self.order = tableau.order
        self.max_newton_iters = max_newton_iters
        self.newton_rtol = newton_rtol
        self.newton_atol = newton_atol
        # optional closed-form Jacobian jac(t, y, args); default jacfwd
        self.jac = jac

    def init(self, f: RHS, t0, y0, args) -> Any:
        return f(t0, y0, args)

    def step(self, f: RHS, t, y, dt, args, state) -> StepResult:
        tab = self.tab
        n_stage = len(tab.c)
        dtype = y.dtype
        g = jnp.asarray(tab.gamma, dtype)

        if self.jac is not None:
            jac = self.jac(t, y, args)
        else:
            jac = jax.jacfwd(lambda yy: f(t, yy, args))(y)
        eye = jnp.eye(y.shape[-1], dtype=dtype)
        w = eye - (dt * g) * jac
        # near-singular W (huge trial dt) can overflow the inverse; clamp
        # so discarded-step gradients stay finite (step is rejected via ok)
        w_inv_raw, min_piv = inv_small_nopivot_minpiv(w)
        w_inv = jnp.clip(jnp.nan_to_num(w_inv_raw, nan=0.0,
                                        posinf=1e18, neginf=-1e18),
                         -1e18, 1e18)

        def newton_stage(t_stage, y_base, k_guess):
            """Solve k = f(t_stage, y_base + dt*gamma*k) by simplified Newton."""
            scale = self.newton_atol + self.newton_rtol * jnp.abs(y)

            def body(_, carry):
                k, _ = carry
                resid = k - f(t_stage, y_base + (dt * g) * k, args)
                delta = w_inv @ resid
                # bound the iterate: a diverging Newton (huge trial dt) must
                # not push k past the TPU-f64 overflow range, or the scan
                # backward pass picks up inf*0 NaNs from discarded steps
                k_new = jnp.clip(k - delta, -1e16, 1e16)
                # convergence monitor only: keep it out of the AD graph so
                # its squares can't poison gradients when a trial step blows
                # up (the step gets rejected anyway)
                inc = jax.lax.stop_gradient(
                    jnp.sqrt(jnp.mean((delta * dt / scale) ** 2))
                )
                return (k_new, inc)

            k, inc = jax.lax.fori_loop(
                0, self.max_newton_iters, body, (k_guess, jnp.inf)
            )
            converged = (inc < 1.0) & jnp.all(jnp.isfinite(k))
            return k, converged

        ks = [state]  # explicit first stage: FSAL slope at (t, y)
        ok = jnp.all(jnp.isfinite(state))
        for i in range(1, n_stage):
            y_base = y + dt * sum(
                jnp.asarray(tab.a[i][j], dtype) * ks[j] for j in range(i)
            )
            k_i, conv = newton_stage(t + tab.c[i] * dt, y_base, ks[-1])
            ks.append(k_i)
            ok = ok & conv

        # stiffly accurate: y1 = last stage's Y = y + dt * sum(a[last][j] k_j)
        y1 = y + dt * sum(
            jnp.asarray(tab.a[-1][j], dtype) * ks[j] for j in range(n_stage)
        )
        f_end = ks[-1]  # slope at (t+dt, y1); FSAL carry

        err_raw = dt * sum(
            jnp.asarray(tab.b_err[j], dtype) * ks[j] for j in range(n_stage)
        )
        # Filter the error through W^-1 (standard for stiff error estimates;
        # avoids order reduction of the estimate on very stiff modes).
        y_err = w_inv @ err_raw

        dense = jnp.stack([ks[0], f_end, (y1 - y) / dt])
        # pivot_ok: finite-but-wrong no-pivot inverse must reject (ADVICE r3)
        ok = ok & jnp.all(jnp.isfinite(y1)) & pivot_ok(w, min_piv)
        return StepResult(y1=y1, y_err=y_err, dense=dense, state=f_end, ok=ok)

    def interp_matrix(self, theta: jnp.ndarray) -> jnp.ndarray:
        return hermite_interp_matrix_from_endpoints(theta)


def TRBDF2(**kwargs) -> ESDIRK:
    """TR-BDF2 ESDIRK 2(3) — reference: ``AutoTsit5(TRBDF2(autodiff=true))``."""
    return ESDIRK(_trbdf2_tableau(), **kwargs)


def Kvaerno3(**kwargs) -> ESDIRK:
    """Kvaerno's ESDIRK 3(2) — a stiffly-accurate L-stable alternative."""
    return ESDIRK(_kvaerno3_tableau(), **kwargs)

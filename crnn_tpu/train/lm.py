"""Levenberg-Marquardt finisher on batched residuals.

Rebuilds robertson/rober_crnn_lm.jl:211-253: after ADAM reaches loss < 0.1,
polish with LM where the residual vector is the per-experiment losses and
the Jacobian comes from forward-mode AD (``ForwardDiff.jacobian`` there,
``jax.jacfwd`` through the while-loop solver here — the residual count and
parameter count are both small, so forward mode is the right shape).

The damped normal equations use the Marquardt scaling (lambda * diag(JtJ))
and a multiplicative trust-region update on lambda.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def levenberg_marquardt(
    residual_fn: Callable,
    p0: jnp.ndarray,
    max_iters: int = 100,
    lam0: float = 1e-3,
    lam_up: float = 3.0,
    lam_down: float = 3.0,
    x_tol: float = 1e-8,
    g_tol: float = 1e-12,
    verbose: bool = False,
) -> Tuple[jnp.ndarray, dict]:
    """Minimise 0.5*||r(p)||^2. residual_fn(p) -> (n_res,).

    Host-driven outer loop (few iterations), jitted inner computations.
    Returns (p_opt, info dict).
    """
    resid_jit = jax.jit(residual_fn)
    jac_jit = jax.jit(jax.jacfwd(residual_fn))

    @jax.jit
    def lm_step(p, lam):
        r = resid_jit(p)
        jac = jac_jit(p)
        jtj = jac.T @ jac
        jtr = jac.T @ r
        damped = jtj + lam * jnp.diag(jnp.diag(jtj)) + 1e-12 * jnp.eye(p.shape[0], dtype=p.dtype)
        # CG on the SPD damped normal equations: pure-jnp matvecs (TPU has
        # no f64 LuDecomposition custom call), np is tiny so CG converges
        # in <= np iterations
        delta, _ = jax.scipy.sparse.linalg.cg(
            lambda x: damped @ x, -jtr, maxiter=4 * p.shape[0], tol=1e-12
        )
        return r, jtr, delta

    p = p0
    lam = lam0
    cost = float(0.5 * jnp.sum(resid_jit(p) ** 2))
    history = [cost]
    converged = False
    for it in range(max_iters):
        r, jtr, delta = lm_step(p, lam)
        if float(jnp.max(jnp.abs(jtr))) < g_tol:
            converged = True
            break
        p_new = p + delta
        cost_new = float(0.5 * jnp.sum(resid_jit(p_new) ** 2))
        if cost_new < cost:
            rel_step = float(jnp.linalg.norm(delta) / (jnp.linalg.norm(p) + 1e-30))
            p, cost = p_new, cost_new
            lam = max(lam / lam_down, 1e-12)
            history.append(cost)
            if verbose:
                print(f"LM iter {it}: cost {cost:.6e} lam {lam:.2e}")
            if rel_step < x_tol:
                converged = True
                break
        else:
            lam = min(lam * lam_up, 1e12)
            if lam >= 1e12:
                break
    return p, {"cost": cost, "history": np.asarray(history), "converged": converged}

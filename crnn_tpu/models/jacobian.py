"""Closed-form CRNN Jacobians for the implicit solvers.

The CRNN RHS is exp/log-linear, so its state Jacobian has the closed form

    J = d(du)/dy = w_out @ diag(rates) @ w_in^T @ diag(clip'(y)/y)

(SURVEY.md §2.2 "CRNN layer": the Jacobian is analytic). Supplying this to
Rosenbrock23/ESDIRK replaces ``jax.jacfwd``'s ns forward-mode RHS
evaluations per step with ONE rates evaluation plus two tiny matmuls —
the dominant per-step cost of the implicit path at small ns.

W-methods tolerate approximate Jacobians, so the exp-cap and clamp
boundary subgradients are handled with simple masks.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from crnn_tpu.models.crnn import R_KCAL
from crnn_tpu.transforms.p2vec import CRNNWeights


def _rates(w: CRNNWeights, feats, exp_cap):
    return jnp.exp(jnp.minimum(w.w_in.T @ feats + w.w_b, exp_cap))


def make_crnn_jac(lb: float, ub: float, exp_cap: float = 32.0) -> Callable:
    """Jacobian of the isothermal CRNN RHS (pairs with make_crnn_rhs)."""

    def jac(t, y, w: CRNNWeights):
        yc = jnp.clip(y, lb, ub)
        logx = jnp.log(yc)
        r = _rates(w, logx, exp_cap)
        in_range = ((y > lb) & (y < ub)).astype(y.dtype)
        dlog = in_range / yc                                   # (ns,)
        return (w.w_out * r[None, :]) @ w.w_in.T * dlog[None, :]

    return jac


def make_crnn_scaled_jac(lb: float, ub: float, dydt_scale,
                         exp_cap: float = 32.0) -> Callable:
    """Jacobian of the scaled CRNN RHS (pairs with make_crnn_scaled_rhs)."""
    base = make_crnn_jac(lb, ub, exp_cap)

    def jac(t, y, w: CRNNWeights):
        return base(t, y, w) * dydt_scale[:, None]

    return jac


def make_crnn_arrhenius_jac(lb: float, ub: float,
                            exp_cap: float = 32.0) -> Callable:
    """Jacobian of the Arrhenius CRNN RHS (pairs with
    make_crnn_arrhenius_rhs). State = [species..., T]; dT/dt = 0 so the
    last row is zero; the last column is the temperature sensitivity of
    the rates through the -1/(R T) feature."""
    inv_r = -1.0 / R_KCAL

    def jac(t, y, w: CRNNWeights):
        x, temp = y[:-1], y[-1]
        ns = x.shape[0]
        xc = jnp.clip(x, lb, ub)
        logx = jnp.log(xc)
        feats = jnp.concatenate([logx, (inv_r / temp)[None]])
        r = _rates(w, feats, exp_cap)                         # (nr,)
        w_in_x = w.w_in[:ns]                                   # species orders
        w_in_ea = w.w_in[ns]                                   # (nr,) Ea row
        in_range = ((x > lb) & (x < ub)).astype(y.dtype)
        dlog = in_range / xc
        j_xx = (w.w_out * r[None, :]) @ w_in_x.T * dlog[None, :]   # (ns, ns)
        # d feats_T/dT = d(-1/(R T))/dT = 1/(R T^2)
        dt_feat = 1.0 / (R_KCAL * temp * temp)
        j_xt = (w.w_out * r[None, :]) @ (w_in_ea * dt_feat)        # (ns,)
        top = jnp.concatenate([j_xx, j_xt[:, None]], axis=1)
        bottom = jnp.zeros((1, ns + 1), y.dtype)
        return jnp.concatenate([top, bottom], axis=0)

    return jac

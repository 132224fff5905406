"""The CRNN right-hand-side family as pure functions.

The core layer everywhere in the reference is

    du = w_out @ exp(w_in^T @ log(clamp(u, lb, ub)) + w_b)

(case1/case1.jl:80-83), optionally extended with Arrhenius temperature
features (case2/case2.jl:113-118), dydt rescaling (case3/case3.jl:162-166),
reversible pairs (case1 rev/case1.jl:81-90), hybrid MLPs
(yeast_glycolysis.jl:138-142, rober_crnn_qssa.jl:122-126) and the
extended-Arrhenius DSC model (Cathode/src/network.jl:68-91).

Every RHS here is a factory closing over STATIC numerics (lb/ub clamps,
scales) and consuming weights as an explicit pytree argument — the solver
differentiates straight through ``args``. Exponents are capped before
``exp`` so rejected trial steps with wild parameters can't poison reverse-
mode gradients with inf*0 NaNs (the driver masks rejected steps, but JAX's
``where`` grad still touches the untaken branch).

The math is one tiny matmul pair per evaluation; under vmap over
experiments/particles the shapes become (B, ns) @ (ns, nr) — exactly the
batched-small-matmul pattern XLA fuses well on TPU. The Pallas fused
RHS+Jacobian kernel in ``crnn_tpu.ops`` accelerates the implicit-solver
path further.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from crnn_tpu.transforms.p2vec import CRNNWeights

# Gas constant in kcal/(mol K) as used by case2 (case2/case2.jl:56) and the
# pruning/missing variants.
R_KCAL = 1.98720425864083e-3
# Gas constant J/(mol K) for Cathode (network.jl:66: R = -1.0/8.314).
R_J = 8.314


def _safe_exp(z, cap: float):
    # NOTE: TPU emulates f64 as double-float pairs with float32 exponent
    # range (overflow ~3.4e38; exp(100) is inf on TPU). Error norms and
    # Newton monitors SQUARE rate-derived values, so the cap must satisfy
    # (e^cap)^2 < 3.4e38 -> cap <= ~44; we use 32 (rates <= 8e13, far above
    # any physical kinetics here). Rejected trial steps with wild parameters
    # rely on this staying finite so reverse-mode gradients cannot be
    # poisoned by inf * 0.
    return jnp.exp(jnp.minimum(z, cap))


def make_crnn_rhs(lb: float, ub: float, exp_cap: float = 32.0) -> Callable:
    """Isothermal mass-action CRNN (case1, case3 without scaling)."""

    def rhs(t, y, w: CRNNWeights):
        logx = jnp.log(jnp.clip(y, lb, ub))
        rates = _safe_exp(w.w_in.T @ logx + w.w_b, exp_cap)
        return w.w_out @ rates

    return rhs


def make_crnn_arrhenius_rhs(lb: float, ub: float, exp_cap: float = 32.0) -> Callable:
    """Arrhenius CRNN: temperature rides as the (constant) last state.

    Input features are [log X; -1/(R*T)], so w_in's extra row is Ea
    (case2/case2.jl:113-118); dT/dt = 0.
    """
    inv_r = -1.0 / R_KCAL

    def rhs(t, y, w: CRNNWeights):
        x, temp = y[:-1], y[-1]
        logx = jnp.log(jnp.clip(x, lb, ub))
        feats = jnp.concatenate([logx, (inv_r / temp)[None]])
        rates = _safe_exp(w.w_in.T @ feats + w.w_b, exp_cap)
        du = w.w_out @ rates
        return jnp.concatenate([du, jnp.zeros((1,), y.dtype)])

    return rhs


def make_crnn_scaled_rhs(lb: float, ub: float, dydt_scale: jnp.ndarray,
                         exp_cap: float = 32.0) -> Callable:
    """CRNN with per-species dy/dt rescaling (case3/case3.jl:162-166,
    robertson/rober_crnn.jl:113-116). ``dydt_scale = yscale / t_end``."""

    def rhs(t, y, w: CRNNWeights):
        logx = jnp.log(jnp.clip(y, lb, ub))
        rates = _safe_exp(w.w_in.T @ logx + w.w_b, exp_cap)
        return (w.w_out @ rates) * dydt_scale

    return rhs


def make_crnn_reversible_rhs(lb: float, order_clip: float = 2.5,
                             exp_cap: float = 32.0) -> Callable:
    """Reversible CRNN: forward/backward orders derived from shared w_out
    with Kc = 1 (case1 rev/case1.jl:81-90)."""

    def rhs(t, y, w: CRNNWeights):
        w_in_f = jnp.clip(-w.w_out, 0.0, order_clip)
        w_in_b = jnp.clip(w.w_out, 0.0, order_clip)
        logx = jnp.log(jnp.clip(y, lb, jnp.inf))
        fwd = _safe_exp(w_in_f.T @ logx + w.w_b, exp_cap)
        bwd = _safe_exp(w_in_b.T @ logx + w.w_kb, exp_cap)
        return w.w_out @ (fwd - bwd)

    return rhs


def make_crnn_yeast_rhs(lb: float, ub: float, ns: int, mlp_apply_fn: Callable,
                        exp_cap: float = 32.0) -> Callable:
    """Hybrid CRNN: an MLP infers hidden species inside the RHS, plus a
    learned constant influx w_J (yeast_glycolysis.jl:138-142).

    args = (weights, mlp_params); ``mlp_apply_fn(params, x)`` maps observed
    (ns,) -> hidden (ns_ - ns,), concatenated to form the full ns_ vector.
    """

    def rhs(t, y, args):
        w, mlp_params = args
        hidden = mlp_apply_fn(mlp_params, y)
        u_full = jnp.concatenate([y, hidden])
        logx = jnp.log(jnp.clip(u_full, lb, ub))
        rates = _safe_exp(w.w_in.T @ logx + w.w_b, exp_cap)
        return (w.w_out @ rates)[:ns] + w.w_J

    return rhs


def make_crnn_qssa_rhs(lb: float, ub: float, mlp_apply_fn: Callable,
                       exp_cap: float = 32.0) -> Callable:
    """QSSA hybrid for Robertson: the fast radical y2 is replaced inside the
    RHS by an MLP of (y1, y3) (rober_crnn_qssa.jl:122-126).

    args = (weights, mlp_params). The MLP output activation is exp (strictly
    positive QSS concentration).
    """

    def rhs(t, y, args):
        w, mlp_params = args
        y2 = mlp_apply_fn(mlp_params, jnp.stack([y[0], y[2]]))
        u_full = jnp.concatenate([y[0:1], y2, y[2:3]])
        logx = jnp.log(jnp.clip(u_full, lb, ub))
        rates = _safe_exp(w.w_in.T @ logx + w.w_b, exp_cap)
        return w.w_out @ rates

    return rhs


# --------------------------------------------------------------------------
# Cathode: DSC thermal decomposition with an extended Arrhenius law
# k_i = exp(lnA_i + b_i ln T - Ea_i*1e5/(R T)), T = T0 + beta/60 * t
# --------------------------------------------------------------------------

def _cathode_rates(logx, temp, w: CRNNWeights, exp_cap: float):
    ln_t = jnp.log(temp)
    temp_term = ln_t * w.extra["b"] - (w.extra["Ea"] * 1e5) / (R_J * temp)
    return _safe_exp(temp_term + w.w_in * logx + w.w_b, exp_cap)


def make_cathode_rhs(lb: float, t0_kelvin: float = 373.15,
                     exp_cap: float = 32.0) -> Callable:
    """Sequential decomposition c1 -> c2 -> c3 under a linear heating ramp
    (Cathode/src/network.jl:60-80). args = (weights, beta [K/min])."""

    def rhs(t, y, args):
        w, beta = args
        temp = t0_kelvin + beta / 60.0 * t
        logx = jnp.log(jnp.clip(y, lb, 10.0))
        rates = _cathode_rates(logx, temp, w, exp_cap)
        du = -rates
        du = du.at[1].add(w.w_out[1] * rates[0])
        du = du.at[2].add(w.w_out[2] * rates[1])
        return du

    return rhs


def make_cathode_rhs_batch(lb: float, t0_kelvin: float = 373.15,
                           exp_cap: float = 32.0):
    """Batch-major cathode RHS with analytic Jacobian and analytic df/dt.

    For ``ode.batch_solve.batch_odesolve_rb23(..., nonautonomous=True)``:
    the whole particle/experiment batch evaluates in ONE fused set of
    (B, 3) elementwise ops per solver stage — the layout that replaces the
    reference's serial 100-particle loop (UQ network.jl:227) with a single
    XLA program over the ensemble.

    args = (w, beta): ``w`` a CRNNWeights whose every leaf carries a
    leading (B,) axis; ``beta`` scalar or (B,) heating rate [K/min].

    The kinetics are k_i(T) = exp(lnA_i + b_i ln T - Ea_i*1e5/(R T)) with
    r_i = k_i * clamp(y_i)^n_i (Cathode/src/network.jl:60-80): each rate
    touches exactly one species, so the Jacobian is the closed bidiagonal
    form J = A @ diag(g) with g_i = r_i * n_i / y_i (A the sequential
    stoichiometry), and df/dt = A @ (r * dz/dT) * dT/dt with
    dz/dT = b/T + Ea*1e5/(R T^2), dT/dt = beta/60 — no jacfwd probes.
    Derivatives are zeroed outside the y-clamp window and past the exp
    cap, matching the subgradients AD produces on the clipped RHS.

    Returns (f, f_jac): ``f(t (B,), y (B,3), args) -> (B,3)`` and
    ``f_jac -> (du, J (B,3,3), ft (B,3))``.
    """

    def _core(t, y, args):
        w, beta = args
        beta = jnp.broadcast_to(jnp.asarray(beta, y.dtype), t.shape)
        temp = t0_kelvin + beta / 60.0 * t                    # (B,)
        yc = jnp.clip(y, lb, 10.0)
        z = (jnp.log(temp)[:, None] * w.extra["b"]
             - (w.extra["Ea"] * 1e5) / (R_J * temp[:, None])
             + w.w_in * jnp.log(yc) + w.w_b)
        rates = jnp.exp(jnp.minimum(z, exp_cap))              # (B, 3)
        return rates, yc, temp, z, beta

    def _assemble(r, w):
        # du = A @ r for the sequential c1 -> c2 -> c3 chain
        return jnp.stack(
            [-r[:, 0],
             w.w_out[:, 1] * r[:, 0] - r[:, 1],
             w.w_out[:, 2] * r[:, 1] - r[:, 2]], axis=-1)

    def f(t, y, args):
        rates, _, _, _, _ = _core(t, y, args)
        return _assemble(rates, args[0])

    def f_jac(t, y, args):
        w = args[0]
        rates, yc, temp, z, beta = _core(t, y, args)
        du = _assemble(rates, w)
        live = ((y > lb) & (y < 10.0) & (z < exp_cap)).astype(y.dtype)
        g = rates * w.w_in / yc * live                        # (B, 3)
        zero = jnp.zeros_like(g[:, 0])
        jac = jnp.stack([
            jnp.stack([-g[:, 0], zero, zero], -1),
            jnp.stack([w.w_out[:, 1] * g[:, 0], -g[:, 1], zero], -1),
            jnp.stack([zero, w.w_out[:, 2] * g[:, 1], -g[:, 2]], -1),
        ], axis=1)
        dz_dt = ((w.extra["b"] / temp[:, None]
                  + (w.extra["Ea"] * 1e5) / (R_J * temp[:, None] ** 2))
                 * (beta / 60.0)[:, None])
        dr_dt = rates * dz_dt * (z < exp_cap).astype(y.dtype)
        ft = _assemble(dr_dt, w)
        return du, jac, ft

    return f, f_jac


def cathode_hrr(ts, ys, w: CRNNWeights, beta, lb: float,
                t0_kelvin: float = 373.15, exp_cap: float = 32.0):
    """Heat-release rate reconstruction: HRR(t) = rates(t) @ delH
    (Cathode/src/network.jl:82-91,121). ys: (n_t, ns)."""
    temp = t0_kelvin + beta / 60.0 * ts                   # (n_t,)
    logx = jnp.log(jnp.clip(ys, lb, 10.0))                 # (n_t, ns)
    ln_t = jnp.log(temp)[:, None]
    temp_term = ln_t * w.extra["b"][None, :] - (w.extra["Ea"] * 1e5)[None, :] / (
        R_J * temp[:, None]
    )
    rates = _safe_exp(temp_term + w.w_in[None, :] * logx + w.w_b[None, :], exp_cap)
    return rates @ w.extra["delH"]

"""Pallas TPU kernels: fused batched CRNN RHS and RHS+Jacobian.

The CRNN evaluation du = w_out @ exp(w_in^T log(clip(y)) + w_b) is the
hottest function in every workload (SURVEY.md §3.1: called O(10^2-10^4)
times per solve). At reference scale (ns <= 12) a single evaluation cannot
fill the MXU; the TPU-native move is to evaluate the WHOLE batch
(experiments x SVGD particles, plus RK stages) in one fused kernel:

    (B, ns) --log--> (B, ns) @ (ns, nr) --+b, exp--> (B, nr) @ (nr, ns)

Two matmuls with the elementwise log/exp fused in between — one VMEM
round-trip instead of XLA's several for the unfused op sequence, and the
batch dimension B (padded to sublane multiples) provides MXU utilisation.

The fused value+Jacobian kernel additionally emits the analytic state
Jacobian J[b] = (w_out * rates[b]) @ w_in^T * (1/y[b]) for the implicit
solvers' W matrices — rates are computed ONCE and shared between value and
Jacobian (vs jacfwd's ns extra RHS evaluations).

For tiny batches the XLA-fused reference implementations below are used;
``crnn_rhs_batched`` dispatches on an empirical batch threshold.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EXP_CAP = 32.0


# ---------------------------------------------------------------------------
# XLA reference implementations (always correct, used for small B and CPU)
# ---------------------------------------------------------------------------

def crnn_rhs_batched_reference(y, w_in, w_b, w_out, lb, ub,
                               exp_cap=_EXP_CAP):
    """du for a batch: y (B, ns) -> (B, ns)."""
    logx = jnp.log(jnp.clip(y, lb, ub))
    z = logx @ w_in + w_b[None, :]
    rates = jnp.exp(jnp.minimum(z, exp_cap))
    return rates @ w_out.T


def crnn_rhs_jac_batched_reference(y, w_in, w_b, w_out, lb, ub,
                                   exp_cap=_EXP_CAP):
    """(du, J): J (B, ns, ns) analytic state Jacobian."""
    yc = jnp.clip(y, lb, ub)
    logx = jnp.log(yc)
    z = logx @ w_in + w_b[None, :]
    rates = jnp.exp(jnp.minimum(z, exp_cap))
    du = rates @ w_out.T
    in_range = ((y > lb) & (y < ub)).astype(y.dtype)
    dlog = in_range / yc                                     # (B, ns)
    jac = jnp.einsum("br,ir,jr->bij", rates, w_out, w_in) * dlog[:, None, :]
    return du, jac


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _rhs_kernel(y_ref, win_ref, wb_ref, wout_ref, du_ref, *, lb, ub, exp_cap):
    y = y_ref[:]
    logx = jnp.log(jnp.clip(y, lb, ub))
    z = jnp.dot(logx, win_ref[:], preferred_element_type=jnp.float32)
    rates = jnp.exp(jnp.minimum(z + wb_ref[:], exp_cap))
    du_ref[:] = jnp.dot(rates, wout_ref[:].T, preferred_element_type=jnp.float32)


def _rhs_jac_kernel(y_ref, win_ref, wb_ref, wout_ref, du_ref, jac_ref,
                    *, lb, ub, exp_cap):
    y = y_ref[:]
    yc = jnp.clip(y, lb, ub)
    logx = jnp.log(yc)
    z = jnp.dot(logx, win_ref[:], preferred_element_type=jnp.float32)
    rates = jnp.exp(jnp.minimum(z + wb_ref[:], exp_cap))
    du_ref[:] = jnp.dot(rates, wout_ref[:].T, preferred_element_type=jnp.float32)
    in_range = jnp.logical_and(y > lb, y < ub).astype(y.dtype)
    dlog = in_range / yc                                     # (B, ns)
    # J[b] = (w_out * rates[b]) @ w_in^T * dlog[b]
    w_out = wout_ref[:]
    w_in_t = win_ref[:].T                                    # (nr, ns)
    b = y.shape[0]
    for i in range(w_out.shape[0]):                          # ns rows, static
        # row i of J for all lanes: (B, nr) * w_out[i] -> @ (nr, ns)
        contrib = jnp.dot(rates * w_out[i][None, :], w_in_t,
                          preferred_element_type=jnp.float32)
        jac_ref[:, i, :] = contrib * dlog


@functools.partial(jax.jit, static_argnames=("lb", "ub", "exp_cap", "interpret"))
def _rhs_pallas(y, w_in, w_b, w_out, lb, ub, exp_cap=_EXP_CAP,
                interpret=False):
    return pl.pallas_call(
        functools.partial(_rhs_kernel, lb=lb, ub=ub, exp_cap=exp_cap),
        out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y, w_in, w_b.reshape(1, -1), w_out)


@functools.partial(jax.jit, static_argnames=("lb", "ub", "exp_cap", "interpret"))
def _rhs_jac_pallas(y, w_in, w_b, w_out, lb, ub, exp_cap=_EXP_CAP,
                    interpret=False):
    b, ns = y.shape
    return pl.pallas_call(
        functools.partial(_rhs_jac_kernel, lb=lb, ub=ub, exp_cap=exp_cap),
        out_shape=(
            jax.ShapeDtypeStruct((b, ns), y.dtype),
            jax.ShapeDtypeStruct((b, ns, ns), y.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(y, w_in, w_b.reshape(1, -1), w_out)


# ---------------------------------------------------------------------------
# Arrhenius variant (case2 family): state = [species..., T], features
# [log X; -1/(R*T)] with w_in = [orders; Ea] (case2/case2.jl:113-118).
# dT/dt = 0 -> last du entry and last Jacobian row are zero; the last
# Jacobian column is the rate sensitivity through the -1/(R T) feature.
# ---------------------------------------------------------------------------

_INV_R_KCAL = -1.0 / 1.98720425864083e-3


def arrhenius_rhs_batched_reference(y, w_in, w_b, w_out, lb, ub,
                                    exp_cap=_EXP_CAP):
    """du for a batch: y (B, ns+1) -> (B, ns+1); w_in (ns+1, nr)."""
    ns = w_out.shape[0]
    x, temp = y[:, :ns], y[:, ns]
    logx = jnp.log(jnp.clip(x, lb, ub))
    z = logx @ w_in[:ns] + (_INV_R_KCAL / temp)[:, None] * w_in[ns][None, :]
    rates = jnp.exp(jnp.minimum(z + w_b[None, :], exp_cap))
    du = rates @ w_out.T
    return jnp.concatenate([du, jnp.zeros((y.shape[0], 1), y.dtype)], axis=1)


def arrhenius_rhs_jac_batched_reference(y, w_in, w_b, w_out, lb, ub,
                                        exp_cap=_EXP_CAP):
    """(du, J) with J (B, ns+1, ns+1) (models/jacobian.py closed form)."""
    b = y.shape[0]
    ns = w_out.shape[0]
    x, temp = y[:, :ns], y[:, ns]
    xc = jnp.clip(x, lb, ub)
    logx = jnp.log(xc)
    z = logx @ w_in[:ns] + (_INV_R_KCAL / temp)[:, None] * w_in[ns][None, :]
    rates = jnp.exp(jnp.minimum(z + w_b[None, :], exp_cap))
    du = rates @ w_out.T
    du = jnp.concatenate([du, jnp.zeros((b, 1), y.dtype)], axis=1)
    in_range = ((x > lb) & (x < ub)).astype(y.dtype)
    dlog = in_range / xc                                         # (B, ns)
    j_xx = jnp.einsum("br,ir,jr->bij", rates, w_out, w_in[:ns]) * dlog[:, None, :]
    dt_feat = (-_INV_R_KCAL) / (temp * temp)                     # 1/(R T^2)
    j_xt = ((rates * w_in[ns][None, :]) @ w_out.T) * dt_feat[:, None]  # (B, ns)
    top = jnp.concatenate([j_xx, j_xt[:, :, None]], axis=2)      # (B, ns, ns+1)
    bottom = jnp.zeros((b, 1, ns + 1), y.dtype)
    return du, jnp.concatenate([top, bottom], axis=1)


def _arrh_rhs_kernel(y_ref, winx_ref, winea_ref, wb_ref, wout_ref, du_ref,
                     *, lb, ub, exp_cap):
    ns = wout_ref.shape[0]
    y = y_ref[:]
    x = y[:, :ns]
    inv_t = _INV_R_KCAL / y[:, ns:ns + 1]                        # (B, 1)
    logx = jnp.log(jnp.clip(x, lb, ub))
    z = jnp.dot(logx, winx_ref[:], preferred_element_type=y.dtype)
    rates = jnp.exp(jnp.minimum(z + inv_t * winea_ref[:] + wb_ref[:], exp_cap))
    du_ref[:, :ns] = jnp.dot(rates, wout_ref[:].T,
                             preferred_element_type=y.dtype)
    du_ref[:, ns:ns + 1] = jnp.zeros_like(inv_t)


def _arrh_rhs_jac_kernel(y_ref, winx_ref, winea_ref, wb_ref, wout_ref,
                         du_ref, jac_ref, *, lb, ub, exp_cap):
    ns = wout_ref.shape[0]
    y = y_ref[:]
    x = y[:, :ns]
    temp = y[:, ns:ns + 1]
    inv_t = _INV_R_KCAL / temp
    xc = jnp.clip(x, lb, ub)
    logx = jnp.log(xc)
    z = jnp.dot(logx, winx_ref[:], preferred_element_type=y.dtype)
    rates = jnp.exp(jnp.minimum(z + inv_t * winea_ref[:] + wb_ref[:], exp_cap))
    du_ref[:, :ns] = jnp.dot(rates, wout_ref[:].T,
                             preferred_element_type=y.dtype)
    du_ref[:, ns:ns + 1] = jnp.zeros_like(inv_t)
    in_range = jnp.logical_and(x > lb, x < ub).astype(y.dtype)
    dlog = in_range / xc                                         # (B, ns)
    dt_feat = (-_INV_R_KCAL) / (temp * temp)                     # (B, 1)
    w_out = wout_ref[:]
    w_in_x_t = winx_ref[:].T                                     # (nr, ns)
    w_in_ea = winea_ref[:]                                       # (1, nr)
    rates_ea = rates * w_in_ea                                   # (B, nr)
    for i in range(ns):                                          # static ns
        rw = rates * w_out[i][None, :]                           # (B, nr)
        jac_ref[:, i, :ns] = jnp.dot(rw, w_in_x_t,
                                     preferred_element_type=y.dtype) * dlog
        jac_ref[:, i, ns:ns + 1] = (
            jnp.sum(rates_ea * w_out[i][None, :], axis=1, keepdims=True)
            * dt_feat
        )
    jac_ref[:, ns, :] = jnp.zeros_like(y)


@functools.partial(jax.jit, static_argnames=("lb", "ub", "exp_cap", "interpret"))
def _arrh_rhs_pallas(y, w_in, w_b, w_out, lb, ub, exp_cap=_EXP_CAP,
                     interpret=False):
    ns = w_out.shape[0]
    return pl.pallas_call(
        functools.partial(_arrh_rhs_kernel, lb=lb, ub=ub, exp_cap=exp_cap),
        out_shape=jax.ShapeDtypeStruct(y.shape, y.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(y, w_in[:ns], w_in[ns].reshape(1, -1), w_b.reshape(1, -1), w_out)


@functools.partial(jax.jit, static_argnames=("lb", "ub", "exp_cap", "interpret"))
def _arrh_rhs_jac_pallas(y, w_in, w_b, w_out, lb, ub, exp_cap=_EXP_CAP,
                         interpret=False):
    b, ns1 = y.shape
    ns = w_out.shape[0]
    return pl.pallas_call(
        functools.partial(_arrh_rhs_jac_kernel, lb=lb, ub=ub, exp_cap=exp_cap),
        out_shape=(
            jax.ShapeDtypeStruct((b, ns1), y.dtype),
            jax.ShapeDtypeStruct((b, ns1, ns1), y.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(y, w_in[:ns], w_in[ns].reshape(1, -1), w_b.reshape(1, -1), w_out)


# ---------------------------------------------------------------------------
# dispatching wrappers
# ---------------------------------------------------------------------------

def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def crnn_rhs_batched(y, w_in, w_b, w_out, lb, ub, exp_cap=_EXP_CAP,
                     min_pallas_batch: int = 64, force=None):
    """Batched CRNN RHS; Pallas on TPU for large batches, XLA otherwise.

    force: None (auto) | 'pallas' | 'xla' | 'interpret'.
    """
    if force == "xla" or (force is None and (
            y.shape[0] < min_pallas_batch or not _on_tpu())):
        return crnn_rhs_batched_reference(y, w_in, w_b, w_out, lb, ub, exp_cap)
    interpret = force == "interpret" or not _on_tpu()
    return _rhs_pallas(y, w_in, w_b, w_out, float(lb), float(ub),
                       float(exp_cap), interpret)


def crnn_rhs_jac_batched(y, w_in, w_b, w_out, lb, ub, exp_cap=_EXP_CAP,
                         min_pallas_batch: int = 64, force=None):
    """Batched fused (du, J); dispatch as in crnn_rhs_batched."""
    if force == "xla" or (force is None and (
            y.shape[0] < min_pallas_batch or not _on_tpu())):
        return crnn_rhs_jac_batched_reference(y, w_in, w_b, w_out, lb, ub,
                                              exp_cap)
    interpret = force == "interpret" or not _on_tpu()
    return _rhs_jac_pallas(y, w_in, w_b, w_out, float(lb), float(ub),
                           float(exp_cap), interpret)


# ---------------------------------------------------------------------------
# differentiable ops (Pallas forward, XLA-reference backward)
#
# pallas_call has no autodiff rules, so the hot-path ops pair the fused
# forward kernel with a custom_vjp whose backward re-derives cotangents via
# jax.vjp of the XLA reference implementation — exactly the pattern the
# Pallas guide prescribes ("Patterns: Custom VJP"). Under the scan driver's
# jax.checkpoint the forward (Pallas) is what gets recomputed in the bwd
# pass, so the kernel accelerates both passes.
# ---------------------------------------------------------------------------

def arrhenius_rhs_batched(y, w_in, w_b, w_out, lb, ub, exp_cap=_EXP_CAP,
                          min_pallas_batch: int = 4096, force=None):
    """Batched Arrhenius RHS; Pallas on TPU, XLA otherwise.

    Measured on TPU v5e (round 2): inside the batch-major Rosenbrock solve
    the XLA path is faster at every batch size tried (B=32..2048, e.g.
    B=512: 35 ms vs 61 ms per forward solve) — at 7-wide lanes the kernels
    are launch-overhead-bound and XLA fuses this op chain well. Auto
    dispatch therefore effectively prefers XLA; force='pallas' remains for
    benchmarking. The winning optimisation at this scale is algorithmic:
    the rank-nr Woodbury W-solve (jac_mode='lowrank', ode/batch_solve.py)."""
    if force == "xla" or (force is None and (
            y.shape[0] < min_pallas_batch or not _on_tpu())):
        return arrhenius_rhs_batched_reference(y, w_in, w_b, w_out, lb, ub,
                                               exp_cap)
    interpret = force == "interpret" or not _on_tpu()
    return _arrh_rhs_pallas(y, w_in, w_b, w_out, float(lb), float(ub),
                            float(exp_cap), interpret)


def arrhenius_rhs_jac_batched(y, w_in, w_b, w_out, lb, ub, exp_cap=_EXP_CAP,
                              min_pallas_batch: int = 4096, force=None):
    """Batched fused Arrhenius (du, J); dispatch as above."""
    if force == "xla" or (force is None and (
            y.shape[0] < min_pallas_batch or not _on_tpu())):
        return arrhenius_rhs_jac_batched_reference(y, w_in, w_b, w_out,
                                                   lb, ub, exp_cap)
    interpret = force == "interpret" or not _on_tpu()
    return _arrh_rhs_jac_pallas(y, w_in, w_b, w_out, float(lb), float(ub),
                                float(exp_cap), interpret)


def arrhenius_rhs_jac_factors_reference(y, w_in, w_b, w_out, lb, ub,
                                        exp_cap=_EXP_CAP):
    """(du, U, V) with J = U @ V exactly (rank nr):
    U = [w_out; 0] (ns+1, nr) shared across lanes, V (B, nr, ns+1) =
    diag(rates[b]) @ [w_in_x^T diag(dlog[b]) | w_in_ea * dt_feat[b]].
    Feeds the Woodbury W-solve in ode/batch_solve.py (jac_mode='lowrank')."""
    b = y.shape[0]
    ns, nr = w_out.shape
    x, temp = y[:, :ns], y[:, ns]
    xc = jnp.clip(x, lb, ub)
    logx = jnp.log(xc)
    z = logx @ w_in[:ns] + (_INV_R_KCAL / temp)[:, None] * w_in[ns][None, :]
    rates = jnp.exp(jnp.minimum(z + w_b[None, :], exp_cap))
    du = jnp.concatenate(
        [rates @ w_out.T, jnp.zeros((b, 1), y.dtype)], axis=1)
    u_fac = jnp.concatenate([w_out, jnp.zeros((1, nr), y.dtype)], axis=0)
    in_range = ((x > lb) & (x < ub)).astype(y.dtype)
    dlog = in_range / xc                                         # (B, ns)
    dt_feat = (-_INV_R_KCAL) / (temp * temp)                     # (B,)
    v_x = w_in[:ns].T[None, :, :] * dlog[:, None, :]             # (B, nr, ns)
    v_t = w_in[ns][None, :, None] * dt_feat[:, None, None]       # (B, nr, 1)
    v_fac = rates[:, :, None] * jnp.concatenate([v_x, v_t], axis=2)
    return du, u_fac, v_fac


def make_arrhenius_factor_op(lb: float, ub: float, exp_cap: float = _EXP_CAP):
    """Differentiable (du, U, V) factor op (XLA; the math is already three
    fused small matmuls — no kernel needed)."""

    def op(y, w_in, w_b, w_out):
        return arrhenius_rhs_jac_factors_reference(y, w_in, w_b, w_out,
                                                   lb, ub, exp_cap)

    return op


def make_arrhenius_ops(lb: float, ub: float, exp_cap: float = _EXP_CAP,
                       force=None):
    """Differentiable batched Arrhenius (rhs_op, rhs_jac_op) pair for the
    batch-major solve driver (ode/batch_solve.py): Pallas forward,
    XLA-reference backward via custom_vjp."""

    @jax.custom_vjp
    def rhs_op(y, w_in, w_b, w_out):
        return arrhenius_rhs_batched(y, w_in, w_b, w_out, lb, ub, exp_cap,
                                     force=force)

    def rhs_fwd(y, w_in, w_b, w_out):
        return rhs_op(y, w_in, w_b, w_out), (y, w_in, w_b, w_out)

    def rhs_bwd(res, g):
        _, vjp = jax.vjp(
            lambda *a: arrhenius_rhs_batched_reference(*a, lb, ub, exp_cap),
            *res,
        )
        return vjp(g)

    rhs_op.defvjp(rhs_fwd, rhs_bwd)

    @jax.custom_vjp
    def rhs_jac_op(y, w_in, w_b, w_out):
        return arrhenius_rhs_jac_batched(y, w_in, w_b, w_out, lb, ub,
                                         exp_cap, force=force)

    def jac_fwd(y, w_in, w_b, w_out):
        return rhs_jac_op(y, w_in, w_b, w_out), (y, w_in, w_b, w_out)

    def jac_bwd(res, g):
        _, vjp = jax.vjp(
            lambda *a: arrhenius_rhs_jac_batched_reference(*a, lb, ub,
                                                           exp_cap),
            *res,
        )
        return vjp(g)

    rhs_jac_op.defvjp(jac_fwd, jac_bwd)
    return rhs_op, rhs_jac_op


def make_crnn_rhs_op(lb: float, ub: float, exp_cap: float = _EXP_CAP,
                     force=None):
    """Differentiable batched RHS op: (y, w_in, w_b, w_out) -> du."""

    @jax.custom_vjp
    def op(y, w_in, w_b, w_out):
        return crnn_rhs_batched(y, w_in, w_b, w_out, lb, ub, exp_cap,
                                force=force)

    def fwd(y, w_in, w_b, w_out):
        return op(y, w_in, w_b, w_out), (y, w_in, w_b, w_out)

    def bwd(res, g):
        _, vjp = jax.vjp(
            lambda *a: crnn_rhs_batched_reference(*a, lb, ub, exp_cap), *res
        )
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


def make_crnn_rhs_jac_op(lb: float, ub: float, exp_cap: float = _EXP_CAP,
                         force=None):
    """Differentiable fused batched (du, J) op."""

    @jax.custom_vjp
    def op(y, w_in, w_b, w_out):
        return crnn_rhs_jac_batched(y, w_in, w_b, w_out, lb, ub, exp_cap,
                                    force=force)

    def fwd(y, w_in, w_b, w_out):
        return op(y, w_in, w_b, w_out), (y, w_in, w_b, w_out)

    def bwd(res, g):
        _, vjp = jax.vjp(
            lambda *a: crnn_rhs_jac_batched_reference(*a, lb, ub, exp_cap),
            *res,
        )
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op

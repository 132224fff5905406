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

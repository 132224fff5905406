"""Whole-solve Pallas kernel: the ENTIRE adaptive Rosenbrock23 integration
in ONE kernel launch.

Round-2 measurement showed the per-op formulation of the batch-major
driver (ode/batch_solve.py) is dispatch-bound at reference scale: a
(B<=30, ns=7) step is ~30 tiny XLA ops, and a solve is ~10^2 steps, so
wall-clock is dominated by op launch/sequencing overhead, not FLOPs
(BASELINE.md utilization analysis). The TPU-native fix is to move the
WHOLE integration loop inside a single Pallas kernel: every carry stays
in VMEM/registers, each step is straight-line VPU/MXU code, and one solve
costs one kernel launch instead of ~10^3 op dispatches.

Design notes (this realises VERDICT.md round-2 item 1):

- LANE-MAJOR layout: state is ``y (ns+1, B)`` with the BATCH on the
  128-lane axis and species on sublanes; every per-lane scalar (t, dt,
  err, status) is a ``(1, B)`` row. At B <= 128 each quantity is a single
  tile, per-lane scalars broadcast along sublanes for free, and no 1-D
  vectors or in-kernel transposes exist anywhere (Mosaic's layout
  inference rejects dynamic lane-axis stores and 1-D replication changes).
- The rank-nr Woodbury W-solve runs in-kernel: the nr x nr inner matrix
  forms via ONE ``(nr*nr, ns) @ (ns, B)`` matmul against a
  host-precomputed coefficient matrix C[r*nr+q, j] = w_in[j,r]*w_out[j,q]
  and inverts per-lane with unrolled Gauss-Jordan on ``(1, B)`` rows.
- Dense ``saveat`` output does NOT happen in the step loop. The kernel
  records each iteration's step endpoints (t, t_new, y, y_new, f0, f2,
  accepted) into step-major (K, ...) history buffers — the dynamic step
  index lands on the leading untiled dimension — and a single XLA
  post-pass contracts the (B, K, n_save) bracket masks with the endpoint
  tensors via batched matmuls (MXU) to produce the cubic-Hermite
  interpolants (the dense-output math of ode/batch_solve.py:211-222).
- Step-size control, statuses, and clipping mirror batch_odesolve_rb23
  exactly (Shampine 2(3) W-method, I-controller) so results agree to
  float rounding.

Forward (no-grad) only: pallas_call has no AD rules, so this kernel
serves the evaluation/prediction paths (the full-dataset eval re-solve of
every epoch — case2/case2.jl:199-201 — plus UQ posterior predictions and
LM residuals); training updates keep the differentiable XLA driver.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_D = 1.0 / (2.0 + math.sqrt(2.0))
_E32 = 6.0 + math.sqrt(2.0)
_INV_R_KCAL = -1.0 / 1.98720425864083e-3

_RUNNING, _DONE, _FAILED = 0, 1, 2


def _inv_rows(m_rows, nr):
    """Invert B-many (nr, nr) matrices stored as nr*nr (1, B) rows
    (index r*nr+q), by unrolled Gauss-Jordan without pivoting.

    The Woodbury inner matrix is I - h*d*V@U — a small perturbation of the
    identity whenever the step is inside the controller's stability
    envelope, so diagonal pivoting is safe; a (near-)singular matrix
    yields inf/nan entries which step acceptance rejects, as in
    ode/linsolve.py.
    """
    aug = [[m_rows[r * nr + q] for q in range(nr)] for r in range(nr)]
    eye = [[jnp.full_like(m_rows[0], 1.0 if r == q else 0.0)
            for q in range(nr)] for r in range(nr)]
    for col in range(nr):
        inv_piv = 1.0 / aug[col][col]
        aug[col] = [a * inv_piv for a in aug[col]]
        eye[col] = [a * inv_piv for a in eye[col]]
        for r in range(nr):
            if r == col:
                continue
            f = aug[r][col]
            aug[r] = [a - f * b for a, b in zip(aug[r], aug[col])]
            eye[r] = [a - f * b for a, b in zip(eye[r], eye[col])]
    return eye  # eye[r][q] = (M^-1)[r, q] as (1, B) rows


def _arrh_rb23_solve_kernel(
    y0_ref, winxt_ref, winea_ref, wb_ref, wout_ref, woodc_ref,
    t_hist_ref, tn_hist_ref, acc_hist_ref,
    y_hist_ref, yn_hist_ref, f0_hist_ref, f2_hist_ref,
    status_ref, nsteps_ref, yfin_ref,
    *, ns, nr, max_steps, t0, t1, rtol, atol, lb, ub, exp_cap,
    safety, factor_min, factor_max, dtmin,
):
    dtype = y0_ref.dtype
    ns1, b = y0_ref.shape

    winxt = winxt_ref[:]        # (nr, ns)   w_in[:ns].T
    winea = winea_ref[:]        # (nr, 1)    Ea feature column
    wb = wb_ref[:]              # (nr, 1)
    wout = wout_ref[:]          # (ns, nr)
    woodc = woodc_ref[:]        # (nr*nr, ns) Woodbury coefficients

    zrow = jnp.zeros((1, b), dtype)

    def rhs(y):
        """du (ns1, B) and rates (nr, B); temperature row is constant."""
        x = y[:ns, :]
        inv_t = _INV_R_KCAL / y[ns:ns1, :]                    # (1, B)
        logx = jnp.log(jnp.clip(x, lb, ub))
        z = jnp.dot(winxt, logx, preferred_element_type=dtype)  # (nr, B)
        rates = jnp.exp(jnp.minimum(z + winea * inv_t + wb, exp_cap))
        dux = jnp.dot(wout, rates, preferred_element_type=dtype)
        return jnp.concatenate([dux, zrow], axis=0), rates

    def err_norm(err, ya, yb):
        scale = atol + rtol * jnp.maximum(jnp.abs(ya), jnp.abs(yb))
        ratio = err / scale
        ratio = jnp.where(jnp.isfinite(ratio), ratio, jnp.inf)
        return jnp.sqrt(jnp.mean(ratio * ratio, axis=0, keepdims=True))

    def rms_rows(v, scale):
        r = v / scale
        return jnp.sqrt(jnp.mean(r * r, axis=0, keepdims=True))  # (1, B)

    y0 = y0_ref[:]

    # ---- Hairer automatic initial dt (controller.py analogue) -------------
    f0_init, _ = rhs(y0)
    scale0 = atol + rtol * jnp.abs(y0)
    d0 = rms_rows(y0, scale0)
    d1 = rms_rows(f0_init, scale0)
    small = jnp.asarray(1e-6, dtype)
    h0 = jnp.where((d0 < 1e-5) | (d1 < 1e-5), small,
                   0.01 * d0 / jnp.maximum(d1, 1e-30))
    h0 = jnp.minimum(h0, t1 - t0)
    f1_probe, _ = rhs(y0 + h0 * f0_init)
    d2 = rms_rows(f1_probe - f0_init, scale0) / jnp.maximum(h0, 1e-30)
    dmax = jnp.maximum(d1, d2)
    h1 = jnp.where(dmax <= 1e-15, jnp.maximum(small, h0 * 1e-3),
                   (0.01 / jnp.maximum(dmax, 1e-30)) ** (1.0 / 3.0))
    dt0 = jnp.minimum(jnp.minimum(100.0 * h0, h1), t1 - t0)

    def body(i, carry):
        # (1,B) rows, y (ns1,B); status/n_steps carried as FLOAT rows —
        # int32 row arithmetic trips a Mosaic relayout bug on this
        # toolchain ("non-singleton logical dimension is replicated")
        t, y, dt, status, n_steps = carry
        running = status < 0.5
        t_rem = t1 - t
        clipped = dt >= t_rem
        dt = jnp.where(running, jnp.minimum(dt, t_rem), dt)
        dt = jnp.maximum(dt, 0.0)
        hd = dt * _D                                          # (1, B)

        # ---- fused value + low-rank Jacobian factors ----------------------
        f0, rates = rhs(y)
        x = y[:ns, :]
        temp = y[ns:ns1, :]
        xc = jnp.clip(x, lb, ub)
        in_range = jnp.logical_and(x > lb, x < ub).astype(dtype)
        dlog = in_range / xc                                  # (ns, B)
        dt_feat = (-_INV_R_KCAL) / (temp * temp)              # (1, B)

        # Woodbury inner matrix M = I - h*d * V@U as nr*nr (1, B) rows:
        # (V@U)[r,q,b] = rates[r,b] * sum_j dlog[j,b]*w_in[j,r]*w_out[j,q]
        vu_flat = jnp.dot(woodc, dlog, preferred_element_type=dtype)
        m_rows = []
        for r in range(nr):
            for q in range(nr):
                vu = rates[r:r + 1, :] * vu_flat[r * nr + q:r * nr + q + 1, :]
                diag = 1.0 if r == q else 0.0
                m_rows.append(diag - hd * vu)
        minv = _inv_rows(m_rows, nr)                          # [r][q] (1, B)

        def wsolve(v):
            # V v = rates * ( w_in^T (v_x*dlog)  +  w_ea * (v_T*dt_feat) )
            vx = v[:ns, :] * dlog
            s = jnp.dot(winxt, vx, preferred_element_type=dtype)  # (nr, B)
            s = rates * (s + winea * (v[ns:ns1, :] * dt_feat))
            xr = jnp.concatenate(
                [sum(minv[r][q] * s[q:q + 1, :] for q in range(nr))
                 for r in range(nr)], axis=0)                 # (nr, B)
            ux = jnp.dot(wout, xr, preferred_element_type=dtype)
            ux = jnp.concatenate([ux, zrow], axis=0)
            return v + hd * ux

        k1 = wsolve(f0)
        f1, _ = rhs(y + (0.5 * dt) * k1)
        k2 = wsolve(f1 - k1) + k1
        y1 = y + dt * k2
        f2, _ = rhs(y1)
        k3 = wsolve(f2 - _E32 * (k2 - f1) - 2.0 * (k1 - f0))
        y_err = (dt / 6.0) * (k1 - 2.0 * k2 + k3)

        ok = jnp.all(jnp.isfinite(y1), axis=0, keepdims=True) & jnp.all(
            jnp.isfinite(y_err), axis=0, keepdims=True)
        err = err_norm(y_err, y, y1)
        err = jnp.where(ok, err, jnp.inf)
        accept = err <= 1.0
        t_new = t + dt

        # ---- record step endpoints for the XLA dense-output post-pass ----
        # step-major (K, ...) layout: the dynamic index i is on the leading
        # untiled dimension
        adv = running & accept
        t_hist_ref[pl.ds(i, 1), :] = t
        tn_hist_ref[pl.ds(i, 1), :] = t_new
        acc_hist_ref[pl.ds(i, 1), :] = adv.astype(dtype)
        y_hist_ref[pl.ds(i, 1), :, :] = y[None]
        yn_hist_ref[pl.ds(i, 1), :, :] = y1[None]
        f0_hist_ref[pl.ds(i, 1), :, :] = f0[None]
        f2_hist_ref[pl.ds(i, 1), :, :] = f2[None]

        # ---- I-controller (ode/controller.py:propose_dt) ------------------
        errc = jnp.maximum(err, 1e-10)
        factor = safety * errc ** (-1.0 / 3.0)
        fmax = jnp.where(accept, factor_max, 1.0)
        factor = jnp.clip(factor, factor_min, fmax)
        dt_next = dt * factor

        finished = accept & clipped
        too_small = dt_next < dtmin
        new_status = jnp.where(
            finished, float(_DONE), jnp.where(too_small, float(_FAILED),
                                              float(_RUNNING))).astype(dtype)

        y1_safe = jnp.where(jnp.isfinite(y1), y1, 0.0)
        return (
            jnp.where(adv, t_new, t),
            jnp.where(adv, y1_safe, y),
            jnp.where(running, dt_next, dt),
            jnp.where(running, new_status, status),
            n_steps + jnp.where(running, 1.0, 0.0).astype(dtype),
        )

    # initial carry rows derived from DATA (y0), not constants: Mosaic
    # gives constants a fully-replicated layout which cannot re-unify with
    # the loop body's computed (non-replicated) layout
    zero_row = y0[0:1, :] * 0.0
    carry0 = (
        zero_row + t0,
        y0,
        dt0,
        zero_row,
        zero_row,
    )
    # early exit: the while cond stops as soon as every lane is done or
    # failed — a typical case2 solve needs ~30 steps of the max_steps=128
    # budget. The acc history must be pre-zeroed because unvisited rows
    # are uninitialised VMEM and acc>0.5 garbage would corrupt the
    # dense-output bracket masks.
    acc_hist_ref[:] = jnp.zeros(acc_hist_ref.shape, dtype)

    def cond_w(carry):
        i, t, y, dt, status, n_steps = carry
        return jnp.logical_and(i < max_steps, jnp.any(status < 0.5))

    def body_w(carry):
        i, *state = carry
        return (i + 1,) + tuple(body(i, tuple(state)))

    _, t, y, dt, status, n_steps = jax.lax.while_loop(
        cond_w, body_w, (jnp.asarray(0, jnp.int32),) + carry0)
    status_ref[:] = status.astype(jnp.int32)
    nsteps_ref[:] = n_steps.astype(jnp.int32)
    yfin_ref[:] = y


@functools.partial(
    jax.jit,
    static_argnames=("ns", "nr", "max_steps", "t0", "t1", "rtol", "atol",
                     "lb", "ub", "exp_cap", "safety", "factor_min",
                     "factor_max", "dtmin_frac", "interpret"),
)
def _arrh_rb23_solve_pallas(
    y0, w_in, w_b, w_out, *, ns, nr, max_steps, t0, t1, rtol, atol,
    lb, ub, exp_cap=32.0, safety=0.9, factor_min=0.2, factor_max=10.0,
    dtmin_frac=1e-12, interpret=False,
):
    b, ns1 = y0.shape
    dtype = y0.dtype
    # host-side precompute: lane-major operands + Woodbury coefficients
    # C[r*nr+q, j] = w_in[j, r] * w_out[j, q]
    woodc = jnp.transpose(
        (w_in[:ns, :, None] * w_out[:, None, :]).reshape(ns, nr * nr))
    kernel = functools.partial(
        _arrh_rb23_solve_kernel,
        ns=ns, nr=nr, max_steps=max_steps, t0=float(t0), t1=float(t1),
        rtol=float(rtol), atol=float(atol), lb=float(lb), ub=float(ub),
        exp_cap=float(exp_cap), safety=float(safety),
        factor_min=float(factor_min), factor_max=float(factor_max),
        dtmin=float(dtmin_frac) * (float(t1) - float(t0)),
    )
    k = max_steps
    outs = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((k, b), dtype),          # t_hist
            jax.ShapeDtypeStruct((k, b), dtype),          # tn_hist
            jax.ShapeDtypeStruct((k, b), dtype),          # acc_hist
            jax.ShapeDtypeStruct((k, ns1, b), dtype),     # y_hist
            jax.ShapeDtypeStruct((k, ns1, b), dtype),     # yn_hist
            jax.ShapeDtypeStruct((k, ns1, b), dtype),     # f0_hist
            jax.ShapeDtypeStruct((k, ns1, b), dtype),     # f2_hist
            jax.ShapeDtypeStruct((1, b), jnp.int32),      # status
            jax.ShapeDtypeStruct((1, b), jnp.int32),      # n_steps
            jax.ShapeDtypeStruct((ns1, b), dtype),        # y_final
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 6,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 10),
        interpret=interpret,
    )(jnp.transpose(y0), jnp.transpose(w_in[:ns]),
      w_in[ns].reshape(-1, 1), w_b.reshape(-1, 1), w_out, woodc)
    # back to batch-major for the dense-output post-pass
    (t_h, tn_h, acc_h, y_h, yn_h, f0_h, f2_h, status, n_steps, y_fin) = outs
    return (t_h.T, tn_h.T, acc_h.T,
            jnp.transpose(y_h, (2, 0, 1)), jnp.transpose(yn_h, (2, 0, 1)),
            jnp.transpose(f0_h, (2, 0, 1)), jnp.transpose(f2_h, (2, 0, 1)),
            jnp.transpose(status), jnp.transpose(n_steps),
            jnp.transpose(y_fin))


def _dense_output(saveat, t0, y0, t_h, tn_h, acc_h, y_h, yn_h, f0_h, f2_h):
    """Cubic-Hermite dense output from recorded step endpoints.

    Each save time lies inside (t, t_new] of exactly one ACCEPTED step;
    the bracket masks (B, K, S) contract with the endpoint tensors
    (B, K, ns) via batched matmuls — one XLA fusion cluster for the whole
    solve (the dense-output math of ode/batch_solve.py:211-222).
    """
    dtype = y_h.dtype
    # unvisited history rows (kernel early exit) hold garbage/NaN VMEM;
    # only acc_h is guaranteed pre-zeroed. Sanitise everything through the
    # accepted mask BEFORE any arithmetic (NaN*0 = NaN would leak through
    # the contraction otherwise).
    ok_row = acc_h > 0.5                                       # (B, K)
    t_h = jnp.where(ok_row, t_h, 0.0)
    tn_h = jnp.where(ok_row, tn_h, -1.0)   # empty bracket: tn < t0 <= s
    y_h = jnp.where(ok_row[:, :, None], y_h, 0.0)
    yn_h = jnp.where(ok_row[:, :, None], yn_h, 0.0)
    f0_h = jnp.where(ok_row[:, :, None], f0_h, 0.0)
    f2_h = jnp.where(ok_row[:, :, None], f2_h, 0.0)
    dt_h = tn_h - t_h                                          # (B, K)
    inv_dt = 1.0 / jnp.maximum(dt_h, 1e-30)
    theta = (saveat[None, None, :] - t_h[:, :, None]) * inv_dt[:, :, None]
    theta = jnp.clip(theta, 0.0, 1.0)                          # (B, K, S)
    bracket = (
        (saveat[None, None, :] > t_h[:, :, None])
        & (saveat[None, None, :] <= tn_h[:, :, None])
        & (acc_h[:, :, None] > 0.5)
    ).astype(dtype)
    th2 = theta * theta
    th3 = th2 * theta
    b_f0 = (theta - 2.0 * th2 + th3) * bracket
    b_f1 = (th3 - th2) * bracket
    b_dy = (3.0 * th2 - 2.0 * th3) * bracket
    b_y0 = bracket

    def contract(w, v):  # (B,K,S) x (B,K,N) -> (B,S,N)
        # HIGHEST: TPU default matmul precision is bf16 multiplies, which
        # corrupts the reconstruction by ~0.5% (measured: a conserved
        # T=343 K state came back 341.3)
        return jnp.einsum("bks,bkn->bsn", w, v,
                          precision=jax.lax.Precision.HIGHEST)

    ys = (
        contract(b_y0 - b_dy, y_h)
        + contract(b_dy, yn_h)
        + contract(b_f0 * dt_h[:, :, None], f0_h)
        + contract(b_f1 * dt_h[:, :, None], f2_h)
    )
    # save times at/before t0 take the initial state
    at_start = (saveat <= t0)[None, :, None]
    return jnp.where(at_start, y0[:, None, :], ys)


def make_arrhenius_fused_solve(
    ns, nr, lb, ub, t0, t1, saveat, rtol, atol, max_steps,
    exp_cap=32.0, interpret=False,
):
    """Whole-solve fused evaluator for the case2 Arrhenius family.

    Returns solve(y0 (B, ns+1), w) -> (ys (B, n_save, ns+1), success (B,))
    — numerically equivalent to ``batch_odesolve_rb23`` forward, at one
    kernel launch + one XLA dense-output cluster per solve. No-grad (eval
    / prediction paths only).
    """
    saveat = jnp.asarray(saveat)

    def solve(y0, w):
        (t_h, tn_h, acc_h, y_h, yn_h, f0_h, f2_h, status, n_steps,
         y_fin) = _arrh_rb23_solve_pallas(
            y0, w.w_in, w.w_b, w.w_out, ns=ns, nr=nr, max_steps=max_steps,
            t0=float(t0), t1=float(t1), rtol=float(rtol), atol=float(atol),
            lb=float(lb), ub=float(ub), exp_cap=float(exp_cap),
            interpret=interpret,
        )
        ys = _dense_output(saveat.astype(y0.dtype), float(t0), y0,
                           t_h, tn_h, acc_h, y_h, yn_h, f0_h, f2_h)
        return ys, status[:, 0] == _DONE
    return solve

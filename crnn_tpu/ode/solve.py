"""odesolve: fixed-shape adaptive integration driver.

The TPU-native equivalent of the reference's
``solve(prob, alg, saveat=tsteps, atol=..., rtol=..., maxiters=...)``
(/root/reference/case1/case1.jl:94, case2/case2.jl:126). Design:

- The whole integration is ONE jitted loop with static shapes. Each batch
  lane (when vmapped over experiments / SVGD particles) carries its own
  ``(t, y, dt, solver_state, status)`` — divergent adaptive trajectories
  coexist in a single SIMD program; finished lanes no-op via masking.
- ``saveat`` output is produced *during* stepping: after every accepted
  step, all save-times inside ``(t, t+dt]`` are filled from the solver's
  dense interpolant. The output buffer has static shape (n_save, ns).
- Two loop drivers share one step body:
    * ``unroll='while'``  — ``lax.while_loop``: early exit, fastest for
      inference / data generation / forward-mode (jvp/jacfwd) gradients
      (the ForwardDiffSensitivity analogue, rober_crnn.jl:122).
    * ``unroll='scan'``   — ``lax.scan`` over ``max_steps`` with a
      rematerialised body: reverse-mode differentiable (the discrete
      checkpointed-adjoint analogue of BacksolveAdjoint(checkpointing=true),
      case2/case2.jl:123) at O(max_steps) memory for the carried state only.
- Step-size decisions are ``stop_gradient``-ed: gradients see a fixed
  accepted-step sequence, matching the reference's AD-through-solver
  semantics.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp

from crnn_tpu.ode.base import RHS, Solver
from crnn_tpu.ode.controller import error_norm, initial_step, propose_dt, propose_dt_pi

_RUNNING = 0
_DONE = 1
_FAILED = 2


class ODESolution(NamedTuple):
    ts: jnp.ndarray       # (n_save,) requested save times
    ys: jnp.ndarray       # (n_save, *y_shape) interpolated solution
    success: jnp.ndarray  # bool: reached t1 (or terminated by event)
    n_steps: jnp.ndarray  # total attempted steps
    n_accepted: jnp.ndarray
    n_rejected: jnp.ndarray
    final_t: jnp.ndarray
    final_y: jnp.ndarray
    event_triggered: jnp.ndarray = None  # bool: terminated early by event_fn


class _Carry(NamedTuple):
    t: jnp.ndarray
    y: jnp.ndarray
    dt: jnp.ndarray
    solver_state: Any
    ys: jnp.ndarray
    status: jnp.ndarray
    n_steps: jnp.ndarray
    n_accepted: jnp.ndarray
    n_rejected: jnp.ndarray
    prev_err: jnp.ndarray
    event: jnp.ndarray


def _tree_select(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


def odesolve(
    f: RHS,
    solver: Solver,
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
    controller: str = "i",
    event_fn=None,
) -> ODESolution:
    """Integrate dy/dt = f(t, y, args) from t0 to t1, saving at ``saveat``.

    All arguments except ``f``, ``solver``, ``max_steps``, ``unroll``,
    ``controller`` and ``event_fn`` may be traced; the function is
    jit/vmap/grad-compatible.

    controller: 'i' (integral) or 'pi' (proportional-integral).
    event_fn(t, y, args) -> bool: terminate-integration event, checked
    after every accepted step (the DiscreteCallback terminate! analogue,
    Cathode/src/network.jl:98-100). Remaining save times are forward-
    filled with the state at the event.
    """
    dtype = jnp.result_type(y0.dtype)
    y0 = jnp.asarray(y0, dtype)
    t0 = jnp.asarray(t0, dtype)
    t1 = jnp.asarray(t1, dtype)
    saveat = jnp.asarray(saveat, dtype)
    rtol = jnp.asarray(rtol, dtype)
    atol = jnp.asarray(atol, dtype)
    span = t1 - t0
    dtmin = dtmin_frac * span

    if dt0 is None:
        dt_init = initial_step(f, t0, t1, y0, args, solver.order, rtol, atol)
    else:
        dt_init = jnp.asarray(dt0, dtype)
    dt_init = jax.lax.stop_gradient(dt_init)

    solver_state0 = solver.init(f, t0, y0, args)

    # pre-fill save times at/before t0 with y0
    ys0 = jnp.where((saveat <= t0)[:, None], y0[None, :], jnp.zeros((saveat.shape[0],) + y0.shape, dtype))

    carry0 = _Carry(
        t=t0,
        y=y0,
        dt=dt_init,
        solver_state=solver_state0,
        ys=ys0,
        status=jnp.asarray(_RUNNING, jnp.int32),
        n_steps=jnp.asarray(0, jnp.int32),
        n_accepted=jnp.asarray(0, jnp.int32),
        n_rejected=jnp.asarray(0, jnp.int32),
        prev_err=jnp.asarray(1.0, dtype),
        event=jnp.asarray(False),
    )

    def body(s: _Carry) -> _Carry:
        running = s.status == _RUNNING
        t_rem = t1 - s.t
        clipped = s.dt >= t_rem
        # Masked (finished/failed) lanes still execute the step body; give
        # them their own last stable dt — an arbitrary constant could be
        # wildly large for the lane's dynamics and overflow inside the
        # (discarded) stage math, poisoning reverse-mode gradients.
        dt = jnp.where(running, jnp.minimum(s.dt, t_rem), s.dt)
        dt = jnp.maximum(dt, jnp.asarray(0.0, dtype))

        res = solver.step(f, s.t, s.y, dt, args, s.solver_state)
        err = jax.lax.stop_gradient(error_norm(res.y_err, s.y, res.y1, rtol, atol))
        err = jnp.where(res.ok, err, jnp.inf)
        accept = err <= 1.0
        t_new = s.t + dt

        # --- dense saveat fill over (t, t_new] -----------------------------
        theta = jnp.clip((saveat - s.t) / jnp.maximum(dt, 1e-30), 0.0, 1.0)
        bmat = solver.interp_matrix(theta).astype(dtype)      # (n_save, n_stages)
        y_interp = s.y[None, :] + dt * (bmat @ res.dense)      # (n_save, ns)
        y_interp = jnp.where(jnp.isfinite(y_interp), y_interp, jnp.zeros_like(y_interp))
        fill = running & accept & (saveat > s.t) & (saveat <= t_new)
        ys = jnp.where(fill[:, None], y_interp, s.ys)

        # --- controller (non-differentiable) -------------------------------
        order = solver.order_for(s.solver_state)
        if controller == "pi":
            dt_prop, prev_err = propose_dt_pi(
                dt, err, s.prev_err, accept, order,
                safety, factor_min, factor_max,
            )
        else:
            dt_prop = propose_dt(dt, err, accept, order,
                                 safety, factor_min, factor_max)
            prev_err = s.prev_err
        dt_next = jax.lax.stop_gradient(dt_prop)
        adv = running & accept

        # --- terminate-on-event (after accepted steps) ---------------------
        if event_fn is not None:
            triggered = adv & event_fn(t_new, res.y1, args)
            y1_ff = jnp.where(jnp.isfinite(res.y1), res.y1, jnp.zeros_like(res.y1))
            # forward-fill all later save times with the state at the event
            fill_rest = triggered & (saveat > t_new)
            ys = jnp.where(fill_rest[:, None], y1_ff[None, :], ys)
        else:
            triggered = jnp.asarray(False)

        finished = (accept & clipped) | triggered
        too_small = dt_next < dtmin
        new_status = jnp.where(
            finished,
            _DONE,
            jnp.where(too_small, _FAILED, _RUNNING),
        ).astype(jnp.int32)
        status = jnp.where(running, new_status, s.status)

        y1_safe = jnp.where(jnp.isfinite(res.y1), res.y1, jnp.zeros_like(res.y1))
        return _Carry(
            t=jnp.where(adv, jax.lax.stop_gradient(t_new), s.t),
            y=jnp.where(adv, y1_safe, s.y),
            dt=jnp.where(running, dt_next, s.dt),
            solver_state=_tree_select(adv, res.state, s.solver_state),
            ys=ys,
            status=status,
            n_steps=s.n_steps + running.astype(jnp.int32),
            n_accepted=s.n_accepted + adv.astype(jnp.int32),
            n_rejected=s.n_rejected + (running & ~accept).astype(jnp.int32),
            prev_err=jax.lax.stop_gradient(jnp.where(running, prev_err, s.prev_err)),
            event=s.event | triggered,
        )

    if unroll == "while":
        final = jax.lax.while_loop(
            lambda s: (s.status == _RUNNING) & (s.n_steps < max_steps),
            body,
            carry0,
        )
    elif unroll == "scan":
        remat_body = jax.checkpoint(body)  # recompute step internals in the bwd pass

        def scan_body(s, _):
            return remat_body(s), None

        final, _ = jax.lax.scan(scan_body, carry0, None, length=max_steps)
    else:
        raise ValueError(f"unknown unroll mode: {unroll!r}")

    return ODESolution(
        ts=saveat,
        ys=final.ys,
        success=final.status == _DONE,
        n_steps=final.n_steps,
        n_accepted=final.n_accepted,
        n_rejected=final.n_rejected,
        final_t=final.t,
        final_y=final.y,
        event_triggered=final.event,
    )

"""AutoSwitch: runtime stiffness detection + explicit/implicit switching.

TPU-native equivalent of the reference's composite algorithms
``AutoTsit5(Rosenbrock23(autodiff=false))`` (/root/reference/case2/case2.jl:26)
and ``AutoTsit5(TRBDF2(autodiff=true))`` (Cathode/src/network.jl:102,
yeast-glycolysis/yeast_glycolysis.jl:33).

Stiffness detection: Tsit5's last two stages are both evaluated at
``t + dt`` (c6 = c7 = 1), so

    rho ~= ||k7 - k6|| / ||z7 - z6||

is a cheap dominant-eigenvalue estimate of the local Jacobian, and
``dt * rho`` compares against the explicit method's stability radius
(~3.25 along the negative real axis for Tsit5). A run of consecutive
"stiff" votes flips the lane to the implicit solver; a run of
"non-stiff" votes (estimated from the implicit solver's dt relative to
the remaining span) flips it back.

All three solver families here carry the same FSAL state — the slope
f(t, y) at the current point — so switching is seamless. Dense output is
unified to cubic Hermite (both branches expose endpoint slopes).

Note on vmap cost: the per-step branch is a ``lax.cond``; under ``vmap``
XLA executes both branches and selects. For heavily batched training
loops where the regime is known, prefer a static solver choice; AutoSwitch
buys robustness for unknown problems at <= 2x step cost. For unknown
batches, ``ode/stiffness.py`` classifies lanes ONCE with a cheap explicit
probe so the epoch loop can run two statically-chosen vmapped solves with
no dead branch.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from crnn_tpu.ode.base import RHS, Solver, StepResult, hermite_interp_matrix_from_endpoints
from crnn_tpu.ode import tsit5 as _t5
from crnn_tpu.ode.tsit5 import Tsit5


class _AutoState(NamedTuple):
    is_stiff: jnp.ndarray       # int32 flag: 0 = explicit, 1 = implicit
    slope: jnp.ndarray          # shared FSAL slope f(t, y)
    stiff_votes: jnp.ndarray    # consecutive stiff votes (int32)
    nonstiff_votes: jnp.ndarray


def _rms(x):
    return jnp.sqrt(jnp.mean(x**2))


class AutoSwitch(Solver):
    """Composite nonstiff/stiff solver with per-lane dynamic switching."""

    implicit = True
    n_stages = 3

    def __init__(
        self,
        nonstiff: Solver = None,
        stiff: Solver = None,
        stability_radius: float = 3.25,
        switch_to_stiff_after: int = 3,
        switch_to_nonstiff_after: int = 25,
        nonstiff_recheck_rho: float = 0.5,
    ):
        if nonstiff is None:
            nonstiff = Tsit5()
        if stiff is None:
            from crnn_tpu.ode.rosenbrock import Rosenbrock23

            stiff = Rosenbrock23()
        assert isinstance(nonstiff, Tsit5), "stiffness estimate needs Tsit5 stages"
        self.nonstiff = nonstiff
        self.stiff = stiff
        self.order = stiff.order  # conservative static default
        self.stability_radius = stability_radius
        self.switch_to_stiff_after = switch_to_stiff_after
        self.switch_to_nonstiff_after = switch_to_nonstiff_after
        self.nonstiff_recheck_rho = nonstiff_recheck_rho

    def init(self, f: RHS, t0, y0, args) -> Any:
        slope = f(t0, y0, args)
        zero = jnp.asarray(0, jnp.int32)
        return _AutoState(is_stiff=zero, slope=slope, stiff_votes=zero, nonstiff_votes=zero)

    def order_for(self, state) -> jnp.ndarray:
        return jnp.where(
            state.is_stiff == 1,
            jnp.asarray(self.stiff.order, jnp.float32),
            jnp.asarray(self.nonstiff.order, jnp.float32),
        )

    def step(self, f: RHS, t, y, dt, args, state: _AutoState) -> StepResult:
        one = jnp.asarray(1, jnp.int32)
        zero = jnp.asarray(0, jnp.int32)

        def explicit_branch(_):
            res = self.nonstiff.step(f, t, y, dt, args, state.slope)
            k = res.dense  # (7, ns)
            z6 = y + dt * (
                _t5.A61 * k[0]
                + _t5.A62 * k[1]
                + _t5.A63 * k[2]
                + _t5.A64 * k[3]
                + _t5.A65 * k[4]
            )
            num = _rms(k[6] - k[5])
            den = jnp.maximum(_rms(res.y1 - z6), 1e-30)
            rho = dt * num / den
            stiff_vote = rho > self.stability_radius
            new_sv = jnp.where(stiff_vote, state.stiff_votes + 1, zero)
            flip = new_sv >= self.switch_to_stiff_after
            dense = jnp.stack([k[0], k[6], (res.y1 - y) / dt])
            new_state = _AutoState(
                is_stiff=jnp.where(flip, one, zero),
                slope=res.state,
                stiff_votes=jnp.where(flip, zero, new_sv),
                nonstiff_votes=zero,
            )
            return StepResult(res.y1, res.y_err, dense, new_state, res.ok)

        def implicit_branch(_):
            res = self.stiff.step(f, t, y, dt, args, state.slope)
            # vote to go back when dt has grown so large that an explicit
            # method would likely be stable again: rho_est from endpoint slopes
            num = _rms(res.state - state.slope)
            den = jnp.maximum(_rms(res.y1 - y), 1e-30)
            rho = dt * num / den
            nonstiff_vote = rho < self.nonstiff_recheck_rho * self.stability_radius
            new_nv = jnp.where(nonstiff_vote, state.nonstiff_votes + 1, zero)
            flip = new_nv >= self.switch_to_nonstiff_after
            new_state = _AutoState(
                is_stiff=jnp.where(flip, zero, one),
                slope=res.state,
                stiff_votes=zero,
                nonstiff_votes=jnp.where(flip, zero, new_nv),
            )
            return StepResult(res.y1, res.y_err, res.dense, new_state, res.ok)

        return jax.lax.cond(state.is_stiff == 0, explicit_branch, implicit_branch, None)

    def interp_matrix(self, theta: jnp.ndarray) -> jnp.ndarray:
        return hermite_interp_matrix_from_endpoints(theta)

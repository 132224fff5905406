"""Solver interface for the crnn_tpu ODE suite.

The reference framework delegates integration to DifferentialEquations.jl
(e.g. ``solve(prob, Tsit5(), saveat=tsteps)`` — /root/reference/case1/case1.jl:94,
``AutoTsit5(Rosenbrock23())`` — case2/case2.jl:26). Here the solvers are
rebuilt as pure-JAX step functions so the whole integration loop stays inside
one XLA computation, is `vmap`-able across experiments/particles (each batch
lane carries its own adaptive state) and differentiable.

A solver provides:

- ``init``   : build solver-specific carried state (e.g. FSAL slot).
- ``step``   : one attempted step ``(t, y, dt) -> StepResult``.
- ``interp_matrix`` : dense-output weights ``B[theta]`` such that
  ``y(t + theta*dt) = y + dt * B(theta) @ ks`` for the stage derivatives
  stored in ``StepResult.dense``. This powers exact ``saveat`` output under
  fixed-shape stepping.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax.numpy as jnp

# RHS signature: f(t, y, args) -> dy/dt.  `args` is an arbitrary pytree of
# parameters; gradients flow through it.
RHS = Callable[[Any, Any, Any], Any]


class StepResult(NamedTuple):
    """Outcome of one attempted step of size ``dt`` from ``(t, y)``."""

    y1: jnp.ndarray        # proposed state at t + dt
    y_err: jnp.ndarray     # local error estimate (same shape as y)
    dense: jnp.ndarray     # (n_stages, *y.shape) stage slopes for interpolation
    state: Any             # next solver state (FSAL slot, Jacobian cache, ...)
    ok: jnp.ndarray        # bool scalar: internal solve converged / finite


class Solver:
    """Base class. Subclasses define a Runge-Kutta-like attempted step."""

    #: classical order of the advancing method (controls step-size exponent)
    order: int = 1
    #: number of stage slopes stored in ``dense``
    n_stages: int = 1
    #: True if the method handles stiff problems (used by AutoSwitch)
    implicit: bool = False

    def init(self, f: RHS, t0, y0, args) -> Any:
        return None

    def order_for(self, state) -> Any:
        """Effective order for step-size control (may depend on state for
        composite solvers like AutoSwitch)."""
        return self.order

    def step(self, f: RHS, t, y, dt, args, state) -> StepResult:
        raise NotImplementedError

    def interp_matrix(self, theta: jnp.ndarray) -> jnp.ndarray:
        """Dense-output weight matrix.

        Args:
          theta: array of shape (m,) of normalised positions in [0, 1].
        Returns:
          (m, n_stages) weights B with y(theta) = y0 + dt * B @ ks.
        """
        raise NotImplementedError


def hermite_interp_matrix_from_endpoints(theta: jnp.ndarray) -> jnp.ndarray:
    """Cubic-Hermite dense output using endpoint slopes (f0, f1).

    Returns (m, 2) weights for stage slopes [f0, f1] PLUS the implied
    contribution of (y1 - y0); callers using this helper store
    ``dense = [f0, f1, (y1 - y0)/dt]`` so that the standard matrix form
    ``y0 + dt * B @ ks`` applies with B of shape (m, 3).
    """
    t = theta
    # y(θ) = y0 + dt*[ (θ - 2θ² + θ³)·f0 + (-θ² + θ³)·f1 + (3θ² - 2θ³)·(Δy/dt) ]
    b_f0 = t - 2.0 * t**2 + t**3
    b_f1 = -(t**2) + t**3
    b_dy = 3.0 * t**2 - 2.0 * t**3
    return jnp.stack([b_f0, b_f1, b_dy], axis=-1)

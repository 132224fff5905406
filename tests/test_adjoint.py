"""Continuous backsolve adjoint vs discrete (scan) adjoint and closed forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crnn_tpu.ode import Rosenbrock23, Tsit5, odesolve
from crnn_tpu.ode.adjoint import odesolve_adjoint


def test_backsolve_matches_closed_form():
    """d/dlam sum(y(t)^2), y = y0 exp(-lam t)."""
    y0 = jnp.array([2.0, 1.0])
    saveat = jnp.linspace(0.5, 3.0, 6)
    lam = jnp.asarray(0.7)

    def loss(lam):
        ys = odesolve_adjoint(
            lambda t, y, a: -a * y, Tsit5(), y0, 0.0, 3.0, saveat,
            args=lam, rtol=1e-10, atol=1e-12,
        )
        return jnp.sum(ys**2)

    g = jax.grad(loss)(lam)
    expected = jnp.sum(
        2.0 * (y0[None, :] * jnp.exp(-lam * saveat)[:, None]) ** 2
        * (-saveat)[:, None]
    )
    np.testing.assert_allclose(float(g), float(expected), rtol=1e-6)


@pytest.mark.parametrize("solver_cls", [Tsit5, Rosenbrock23])
def test_backsolve_matches_discrete_adjoint(solver_cls):
    """Continuous adjoint == scan-mode discrete adjoint on a CRNN-like RHS,
    for both y0 and parameter cotangents."""
    key = jax.random.PRNGKey(0)
    ns, nr = 3, 2
    # keep rates small so the random mechanism doesn't blow up: the
    # backsolve contract requires a successful forward solve
    p = 0.1 * jax.random.normal(key, (2 * ns * nr + nr,), jnp.float64)
    p = p.at[2 * ns * nr:].add(-1.0)
    y0 = jnp.array([1.0, 0.8, 0.4])
    saveat = jnp.linspace(0.0, 2.0, 5)  # includes t0 (jump at t0 path)

    def rhs(t, y, p):
        w_in = jnp.abs(p[: ns * nr].reshape(ns, nr))
        w_out = p[ns * nr : 2 * ns * nr].reshape(ns, nr)
        w_b = p[2 * ns * nr :]
        logx = jnp.log(jnp.clip(y, 1e-8, 1e1))
        return w_out @ jnp.exp(w_in.T @ logx + w_b)

    def loss_cont(p, y0):
        ys = odesolve_adjoint(rhs, solver_cls(), y0, 0.0, 2.0, saveat,
                              args=p, rtol=1e-10, atol=1e-12)
        return jnp.mean(ys**2) + jnp.sum(ys[:, 0])

    def loss_disc(p, y0):
        sol = odesolve(rhs, solver_cls(), y0, 0.0, 2.0, saveat, args=p,
                       rtol=1e-10, atol=1e-12, unroll="scan", max_steps=2048)
        return jnp.mean(sol.ys**2) + jnp.sum(sol.ys[:, 0])

    gp_c, gy_c = jax.grad(loss_cont, argnums=(0, 1))(p, y0)
    gp_d, gy_d = jax.grad(loss_disc, argnums=(0, 1))(p, y0)
    np.testing.assert_allclose(np.asarray(gp_c), np.asarray(gp_d),
                               rtol=1e-5, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gy_c), np.asarray(gy_d),
                               rtol=1e-5, atol=1e-10)

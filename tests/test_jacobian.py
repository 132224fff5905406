"""Analytic CRNN Jacobians vs forward-mode AD, and solver equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crnn_tpu.models.crnn import (
    make_crnn_arrhenius_rhs,
    make_crnn_rhs,
    make_crnn_scaled_rhs,
)
from crnn_tpu.models.jacobian import (
    make_crnn_arrhenius_jac,
    make_crnn_jac,
    make_crnn_scaled_jac,
)
from crnn_tpu.ode import Rosenbrock23, TRBDF2, odesolve
from crnn_tpu.transforms.p2vec import p2vec_case1, p2vec_case2


def _weights(key, ns, nr):
    p = 0.3 * jax.random.normal(key, (nr * (ns + 1),), jnp.float64)
    return p2vec_case1(p, ns, nr, b0=-1.0)


def test_isothermal_jacobian_matches_ad():
    key = jax.random.PRNGKey(0)
    ns, nr = 5, 4
    w = _weights(key, ns, nr)
    lb, ub = 1e-5, 10.0
    rhs = make_crnn_rhs(lb, ub)
    jac = make_crnn_jac(lb, ub)
    y = jnp.abs(jax.random.normal(key, (ns,), jnp.float64)) + 0.1
    j_ad = jax.jacfwd(lambda yy: rhs(0.0, yy, w))(y)
    j_an = jac(0.0, y, w)
    np.testing.assert_allclose(np.asarray(j_an), np.asarray(j_ad),
                               rtol=1e-12, atol=1e-12)


def test_scaled_jacobian_matches_ad():
    key = jax.random.PRNGKey(1)
    ns, nr = 3, 6
    w = _weights(key, ns, nr)
    scale = jnp.array([0.5, 2.0, 1.3])
    lb = 1e-8
    rhs = make_crnn_scaled_rhs(lb, jnp.inf, scale)
    jac = make_crnn_scaled_jac(lb, jnp.inf, scale)
    y = jnp.array([0.3, 1.5, 0.9])
    j_ad = jax.jacfwd(lambda yy: rhs(0.0, yy, w))(y)
    np.testing.assert_allclose(np.asarray(jac(0.0, y, w)), np.asarray(j_ad),
                               rtol=1e-12, atol=1e-14)


def test_arrhenius_jacobian_matches_ad():
    key = jax.random.PRNGKey(2)
    ns, nr = 6, 3
    p = 0.1 * jax.random.normal(key, (nr * (ns + 2) + 1,), jnp.float64)
    p = p.at[-1].set(0.05)
    w = p2vec_case2(p, ns, nr)
    lb, ub = 1e-6, 10.0
    rhs = make_crnn_arrhenius_rhs(lb, ub)
    jac = make_crnn_arrhenius_jac(lb, ub)
    y = jnp.concatenate([
        jnp.abs(jax.random.normal(key, (ns,), jnp.float64)) + 0.1,
        jnp.asarray([330.0]),
    ])
    j_ad = jax.jacfwd(lambda yy: rhs(0.0, yy, w))(y)
    np.testing.assert_allclose(np.asarray(jac(0.0, y, w)), np.asarray(j_ad),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("solver_pair", [
    lambda jac: Rosenbrock23(jac=jac),
    lambda jac: TRBDF2(jac=jac),
])
def test_solver_with_analytic_jacobian(solver_pair):
    """Implicit solve with analytic J matches the jacfwd solve."""
    key = jax.random.PRNGKey(3)
    ns, nr = 5, 4
    w = _weights(key, ns, nr)
    lb, ub = 1e-5, 10.0
    rhs = make_crnn_rhs(lb, ub)
    jac = make_crnn_jac(lb, ub)
    y0 = jnp.abs(jax.random.normal(key, (ns,), jnp.float64)) + 0.2
    saveat = jnp.linspace(0.5, 5.0, 8)
    kw = dict(rtol=1e-8, atol=1e-10, max_steps=4096)
    sol_an = odesolve(rhs, solver_pair(jac), y0, 0.0, 5.0, saveat, args=w, **kw)
    sol_ad = odesolve(rhs, solver_pair(None), y0, 0.0, 5.0, saveat, args=w, **kw)
    assert bool(sol_an.success) and bool(sol_ad.success)
    np.testing.assert_allclose(np.asarray(sol_an.ys), np.asarray(sol_ad.ys),
                               rtol=1e-6, atol=1e-10)

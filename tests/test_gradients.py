"""Gradient parity through the solvers (SURVEY.md §4 strategy (2)).

The reference differentiates through DifferentialEquations.jl in five ways
(SURVEY §2.2 "Sensitivity/AD"); here both JAX modes are validated:
- reverse-mode through the scan driver (BacksolveAdjoint/checkpointing analogue)
- forward-mode (jvp/jacfwd) through the while driver (ForwardDiffSensitivity
  analogue, robertson/rober_crnn.jl:122)
against closed forms and central finite differences at rtol 1e-5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crnn_tpu.ode import Kvaerno3, Rosenbrock23, Tsit5, TRBDF2, odesolve


def _loss_expdecay(lam, unroll):
    y0 = jnp.array([2.0, 1.0])
    saveat = jnp.linspace(0.1, 3.0, 7)
    sol = odesolve(
        lambda t, y, a: -a * y, Tsit5(), y0, 0.0, 3.0, saveat,
        args=lam, rtol=1e-10, atol=1e-12, max_steps=2048, unroll=unroll,
    )
    return jnp.sum(sol.ys**2)


def test_reverse_grad_closed_form():
    """d/dlam sum(y(t)^2) with y = y0 exp(-lam t): closed form parity."""
    lam = jnp.asarray(0.7)
    g = jax.grad(_loss_expdecay)(lam, "scan")
    y0 = jnp.array([2.0, 1.0])
    saveat = jnp.linspace(0.1, 3.0, 7)
    expected = jnp.sum(
        2.0 * (y0[None, :] * jnp.exp(-lam * saveat)[:, None]) ** 2
        * (-saveat)[:, None]
    )
    np.testing.assert_allclose(float(g), float(expected), rtol=1e-6)


def test_forward_grad_closed_form():
    """jacfwd through the while driver matches the same closed form."""
    lam = jnp.asarray(0.7)
    g = jax.jacfwd(_loss_expdecay)(lam, "while")
    g_rev = jax.grad(_loss_expdecay)(lam, "scan")
    np.testing.assert_allclose(float(g), float(g_rev), rtol=1e-8)


def _crnn_like_rhs(t, y, p):
    """A miniature CRNN RHS: du = w_out @ exp(w_in^T log(clamp(u)) + b)."""
    ns, nr = 3, 2
    w_in = jnp.abs(p[: ns * nr].reshape(ns, nr))
    w_out = p[ns * nr : 2 * ns * nr].reshape(ns, nr)
    w_b = p[2 * ns * nr :]
    logx = jnp.log(jnp.clip(y, 1e-8, 1e1))
    rates = jnp.exp(w_in.T @ logx + w_b)
    return w_out @ rates


@pytest.mark.parametrize("solver_cls", [Tsit5, Rosenbrock23, TRBDF2, Kvaerno3])
def test_grad_vs_finite_difference(solver_cls):
    """Central FD parity on a CRNN-shaped RHS, all solver families."""
    key = jax.random.PRNGKey(0)
    p = 0.3 * jax.random.normal(key, (14,), dtype=jnp.float64)
    y0 = jnp.array([1.0, 0.8, 0.4])
    saveat = jnp.linspace(0.2, 2.0, 5)

    def loss(p, unroll):
        sol = odesolve(
            _crnn_like_rhs, solver_cls(), y0, 0.0, 2.0, saveat,
            args=p, rtol=1e-9, atol=1e-11, max_steps=4096, unroll=unroll,
        )
        return jnp.mean(jnp.abs(sol.ys))

    g_rev = np.asarray(jax.grad(loss)(p, "scan"))
    g_fwd = np.asarray(jax.jacfwd(loss)(p, "while"))
    np.testing.assert_allclose(g_rev, g_fwd, rtol=1e-5, atol=1e-10)

    eps = 1e-6
    g_fd = np.zeros_like(g_rev)
    for i in range(p.shape[0]):
        dp = np.zeros(p.shape[0])
        dp[i] = eps
        g_fd[i] = (float(loss(p + dp, "while")) - float(loss(p - dp, "while"))) / (
            2 * eps
        )
    # FD perturbs the accepted-step sequence, adding controller jitter on
    # top of truncation error — hence the slightly looser bar than the
    # exact rev-vs-fwd comparison above.
    np.testing.assert_allclose(g_rev, g_fd, rtol=1e-4, atol=1e-8)


def test_grad_through_vmap():
    """Batched-experiment gradients == sum of per-experiment gradients."""
    p = jnp.array([0.5, 0.3])
    y0s = jnp.array([[1.0], [2.0], [0.5]])

    def single_loss(p, y0):
        sol = odesolve(
            lambda t, y, a: -(a[0] + a[1]) * y, Tsit5(), y0, 0.0, 1.0,
            jnp.array([0.5, 1.0]), args=p, rtol=1e-9, atol=1e-12, max_steps=512,
        )
        return jnp.sum(sol.ys)

    def batch_loss(p):
        return jnp.sum(jax.vmap(lambda y0: single_loss(p, y0))(y0s))

    g_batch = jax.grad(batch_loss)(p)
    g_sum = sum(jax.grad(single_loss)(p, y0s[i]) for i in range(3))
    np.testing.assert_allclose(np.asarray(g_batch), np.asarray(g_sum), rtol=1e-7)


def test_grad_robertson_stiff():
    """Gradients w.r.t. rate constants survive the stiff Robertson solve."""
    k = jnp.array([4e-2, 3e7, 1e4])
    y0 = jnp.array([1.0, 0.0, 0.0])
    saveat = 10 ** jnp.linspace(0, 4, 10)

    def rhs(t, y, k):
        r1 = k[0] * y[0]
        r2 = k[1] * y[1] * y[1]
        r3 = k[2] * y[1] * y[2]
        return jnp.array([-r1 + r3, r1 - r2 - r3, r2])

    def loss(logk, unroll):
        sol = odesolve(
            rhs, TRBDF2(), y0, 0.0, 1e4, saveat,
            args=jnp.exp(logk), rtol=1e-8,
            atol=jnp.array([1e-10, 1e-12, 1e-10]), max_steps=8192, unroll=unroll,
        )
        return jnp.mean(sol.ys[:, 2])

    logk = jnp.log(k)
    g_rev = np.asarray(jax.grad(loss)(logk, "scan"))
    g_fwd = np.asarray(jax.jacfwd(loss)(logk, "while"))
    assert np.all(np.isfinite(g_rev))
    np.testing.assert_allclose(g_rev, g_fwd, rtol=1e-4, atol=1e-12)

    eps = 1e-5
    for i in range(3):
        d = np.zeros(3)
        d[i] = eps
        fd = (float(loss(logk + d, "while")) - float(loss(logk - d, "while"))) / (2 * eps)
        np.testing.assert_allclose(g_rev[i], fd, rtol=2e-3, atol=1e-10)

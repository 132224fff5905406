"""Event termination + PI controller tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from crnn_tpu.ode import Rosenbrock23, Tsit5, odesolve


def test_event_termination():
    """Integration stops when y1 crosses the threshold; later save times
    are forward-filled (terminate! DiscreteCallback analogue)."""

    def f(t, y, args):
        return -y

    y0 = jnp.array([1.0])
    saveat = jnp.linspace(0.0, 10.0, 21)
    sol = odesolve(
        f, Tsit5(), y0, 0.0, 10.0, saveat, rtol=1e-8, atol=1e-10,
        unroll="while",
        event_fn=lambda t, y, args: y[0] < 0.5,
    )
    assert bool(sol.success)
    assert bool(sol.event_triggered)
    t_event = -jnp.log(0.5)  # ~0.693
    assert float(sol.final_t) < 1.0
    # points before the event match exp(-t); points after are frozen
    before = np.asarray(saveat) < float(sol.final_t)
    np.testing.assert_allclose(
        np.asarray(sol.ys[before, 0]), np.exp(-np.asarray(saveat)[before]),
        rtol=1e-6,
    )
    after = np.asarray(saveat) > float(sol.final_t)
    frozen = np.asarray(sol.ys[after, 0])
    np.testing.assert_allclose(frozen, frozen[0], rtol=1e-12)
    assert frozen[0] <= 0.5 + 1e-6
    assert float(t_event) < 1.0  # sanity


def test_event_not_triggered():
    def f(t, y, args):
        return -0.01 * y

    sol = odesolve(
        f, Tsit5(), jnp.array([1.0]), 0.0, 1.0, jnp.array([1.0]),
        rtol=1e-6, atol=1e-9, unroll="while",
        event_fn=lambda t, y, args: y[0] < 0.5,
    )
    assert bool(sol.success)
    assert not bool(sol.event_triggered)


@pytest.mark.parametrize("solver_cls", [Tsit5, Rosenbrock23])
def test_pi_controller_accuracy_and_efficiency(solver_cls):
    """PI controller solves to the same accuracy; on smooth problems it
    should not reject more steps than the I-controller."""

    def f(t, y, args):
        return jnp.array([y[1], -y[0] * (1.0 + 0.3 * jnp.sin(t))])

    y0 = jnp.array([1.0, 0.0])
    saveat = jnp.linspace(0.0, 20.0, 10)
    kw = dict(rtol=1e-7, atol=1e-9, max_steps=8192, unroll="while")
    sol_i = odesolve(f, solver_cls(), y0, 0.0, 20.0, saveat, controller="i", **kw)
    sol_pi = odesolve(f, solver_cls(), y0, 0.0, 20.0, saveat, controller="pi", **kw)
    assert bool(sol_i.success) and bool(sol_pi.success)
    # different (valid) dt sequences differ at the tolerance level
    np.testing.assert_allclose(np.asarray(sol_pi.ys), np.asarray(sol_i.ys),
                               rtol=1e-4, atol=1e-4)
    assert int(sol_pi.n_rejected) <= int(sol_i.n_rejected) + 5

"""Solver validation vs closed forms and SciPy reference trajectories.

Mirrors the test strategy SURVEY.md §4 prescribes (the reference itself has
no tests): solver-vs-reference, convergence order, stiff accuracy, vmap
consistency.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.integrate import solve_ivp

from crnn_tpu.ode import (
    AutoSwitch,
    Kvaerno3,
    Rosenbrock23,
    Tsit5,
    TRBDF2,
    odesolve,
)

ALL_SOLVERS = [Tsit5, Rosenbrock23, TRBDF2, Kvaerno3, AutoSwitch]


def _expdecay(t, y, args):
    return -args * y


@pytest.mark.parametrize("solver_cls", ALL_SOLVERS)
@pytest.mark.parametrize("unroll", ["while", "scan"])
def test_exponential_decay(solver_cls, unroll):
    lam = jnp.asarray(0.7)
    y0 = jnp.array([2.0, 1.0])
    saveat = jnp.linspace(0.0, 5.0, 21)
    sol = odesolve(
        _expdecay, solver_cls(), y0, 0.0, 5.0, saveat,
        args=lam, rtol=1e-8, atol=1e-10, max_steps=4096, unroll=unroll,
    )
    assert bool(sol.success)
    expected = y0[None, :] * jnp.exp(-lam * saveat)[:, None]
    np.testing.assert_allclose(np.asarray(sol.ys), np.asarray(expected), rtol=2e-5)


def _vdp(t, y, mu):
    return jnp.array([y[1], mu * ((1 - y[0] ** 2) * y[1]) - y[0]])


@pytest.mark.parametrize("solver_cls", [Tsit5, Rosenbrock23, TRBDF2, Kvaerno3])
def test_van_der_pol_vs_scipy(solver_cls):
    """Mildly stiff Van der Pol: compare against a tight scipy solve."""
    mu = 5.0
    y0 = np.array([2.0, 0.0])
    t1 = 10.0
    saveat = np.linspace(0.0, t1, 25)
    ref = solve_ivp(
        lambda t, y: [y[1], mu * ((1 - y[0] ** 2) * y[1]) - y[0]],
        (0, t1), y0, method="LSODA", t_eval=saveat, rtol=1e-10, atol=1e-12,
    )
    sol = odesolve(
        _vdp, solver_cls(), jnp.asarray(y0), 0.0, t1, jnp.asarray(saveat),
        args=mu, rtol=1e-7, atol=1e-9, max_steps=16384,
    )
    assert bool(sol.success)
    np.testing.assert_allclose(np.asarray(sol.ys), ref.y.T, rtol=2e-3, atol=2e-5)


def _robertson(t, y, k):
    r1 = k[0] * y[0]
    r2 = k[1] * y[1] * y[1]
    r3 = k[2] * y[1] * y[2]
    return jnp.array([-r1 + r3, r1 - r2 - r3, r2])


@pytest.mark.parametrize(
    "solver_cls,cmp_atol",
    [(Rosenbrock23, 5e-7), (TRBDF2, 1e-9), (Kvaerno3, 1e-9)],
)
def test_robertson_stiff_vs_scipy(solver_cls, cmp_atol):
    """The reference's hardest workload: Robertson over t in [0, 1e5]
    (robertson/rober_crnn.jl:48,52)."""
    k = jnp.array([4e-2, 3e7, 1e4])
    y0 = jnp.array([1.0, 0.0, 0.0])
    saveat = jnp.concatenate([jnp.zeros((1,)), 10 ** jnp.linspace(0, 5, 40)])
    ref = solve_ivp(
        lambda t, y: np.asarray(_robertson(t, jnp.asarray(y), k)),
        (0, 1e5), np.asarray(y0), method="BDF",
        t_eval=np.asarray(saveat), rtol=1e-10, atol=1e-14,
    )
    sol = odesolve(
        _robertson, solver_cls(), y0, 0.0, 1e5, saveat,
        args=k, rtol=1e-7, atol=jnp.array([1e-8, 1e-12, 1e-8]), max_steps=16384,
    )
    assert bool(sol.success)
    # species 2 is ~1e-5 scale; compare with per-species mixed tolerance.
    # cmp_atol is order-dependent: the 2nd-order W-method accumulates more
    # global error on the tiny QSS species than the ESDIRK pair.
    np.testing.assert_allclose(np.asarray(sol.ys), ref.y.T, rtol=2e-3, atol=cmp_atol)


def test_autoswitch_robertson():
    """AutoSwitch must flip to the implicit branch and still solve Robertson."""
    k = jnp.array([4e-2, 3e7, 1e4])
    y0 = jnp.array([1.0, 0.0, 0.0])
    saveat = 10 ** jnp.linspace(0, 5, 10)
    sol = odesolve(
        _robertson, AutoSwitch(Tsit5(), TRBDF2()), y0, 0.0, 1e5, saveat,
        args=k, rtol=1e-6, atol=1e-10, max_steps=16384, unroll="while",
    )
    assert bool(sol.success)
    # mass conservation
    np.testing.assert_allclose(np.asarray(sol.ys.sum(-1)), 1.0, rtol=1e-5)
    # far fewer steps than an explicit method would need (~ dt_stable 1e-7)
    assert int(sol.n_steps) < 2000


def test_stiffness_classification():
    """classify_stiffness separates Robertson lanes (stiff) from decay
    lanes (nonstiff) so batched training can use static per-group solvers
    instead of AutoSwitch's pay-both-branches cond-under-vmap."""
    from crnn_tpu.ode.stiffness import classify_stiffness, partition_by_stiffness

    k = jnp.array([4e-2, 3e7, 1e4])
    u0s = jnp.array([[1.0, 0.0, 0.0], [0.5, 1e-8, 0.9]])
    stiff_mask = classify_stiffness(_robertson, u0s, 0.0, 1e4, args=k)
    assert bool(stiff_mask.all()), "Robertson lanes must classify stiff"
    decay_mask = classify_stiffness(_expdecay, u0s, 0.0, 5.0,
                                    args=jnp.asarray(0.7))
    assert not bool(decay_mask.any()), "decay lanes must classify nonstiff"
    nonstiff_idx, stiff_idx = partition_by_stiffness(stiff_mask)
    assert len(stiff_idx) == 2 and len(nonstiff_idx) == 0


def test_autoswitch_per_lane_order():
    """The controller must see each branch's own order (VERDICT r1 weak #8):
    order_for(state) is 5 on the Tsit5 branch and the stiff order on the
    implicit branch, and the I-controller's growth exponent follows it."""
    from crnn_tpu.ode.controller import propose_dt

    solver = AutoSwitch(Tsit5(), TRBDF2())
    f = lambda t, y, args: -y
    y0 = jnp.ones(3)
    state = solver.init(f, 0.0, y0, None)
    assert float(solver.order_for(state)) == float(solver.nonstiff.order)
    stiff_state = state._replace(is_stiff=jnp.asarray(1, jnp.int32))
    assert float(solver.order_for(stiff_state)) == float(solver.stiff.order)
    # same error, different order -> different proposed dt (larger exponent
    # magnitude for the low-order branch)
    err = jnp.asarray(0.25)
    dt5 = float(propose_dt(jnp.asarray(1.0), err, jnp.asarray(True),
                            solver.order_for(state)))
    dt2 = float(propose_dt(jnp.asarray(1.0), err, jnp.asarray(True),
                            solver.order_for(stiff_state)))
    assert dt2 > dt5  # err<1: lower order grows dt MORE per unit error
    np.testing.assert_allclose(dt5, 0.9 * 0.25 ** (-1.0 / 6.0), rtol=1e-6)
    np.testing.assert_allclose(dt2, 0.9 * 0.25 ** (-1.0 / 3.0), rtol=1e-6)
    # vmapped lanes with disagreeing branches report per-lane orders
    states = jax.tree.map(lambda a, b: jnp.stack([a, b]), state, stiff_state)
    orders = jax.vmap(solver.order_for)(states)
    np.testing.assert_allclose(np.asarray(orders),
                               [solver.nonstiff.order, solver.stiff.order])


@pytest.mark.parametrize("solver_cls,expected_order", [(Tsit5, 5), (Kvaerno3, 3), (TRBDF2, 2), (Rosenbrock23, 2)])
def test_convergence_order(solver_cls, expected_order):
    """Fixed-step global convergence rate matches the advertised order.

    Run with adaptivity disabled by huge tolerances + dt0 and factor caps=1.
    """
    y0 = jnp.array([1.0])
    t1 = 1.0

    def f(t, y, args):
        return -y + jnp.sin(3.0 * t)

    def solve_with_dt(dt0):
        sol = odesolve(
            f, solver_cls(), y0, 0.0, t1, jnp.array([t1]),
            args=None, rtol=1e30, atol=1e30, dt0=dt0, max_steps=int(t1 / dt0) + 10,
            factor_min=1.0, factor_max=1.0, safety=1.0, unroll="while",
        )
        return sol.final_y[0]

    exact = solve_with_dt(1e-4)
    errs = []
    dts = [0.05, 0.025, 0.0125]
    for dt in dts:
        errs.append(abs(float(solve_with_dt(dt)) - float(exact)))
    rate = np.log2(errs[0] / errs[-1]) / 2.0
    assert rate > expected_order - 0.55, f"observed order {rate:.2f}"


def test_vmap_consistency():
    """vmapped batch solve == per-element solves (per-lane adaptivity)."""
    k = jnp.array([4e-2, 3e7, 1e4])
    y0s = jnp.array([[1.0, 0.0, 0.0], [0.5, 1e-8, 0.9], [2.0, 0.0, 0.1]])
    saveat = 10 ** jnp.linspace(0, 4, 15)

    def single(y0):
        return odesolve(
            _robertson, Rosenbrock23(), y0, 0.0, 1e4, saveat,
            args=k, rtol=1e-6, atol=1e-10, max_steps=8192,
        ).ys

    batched = jax.vmap(single)(y0s)
    for i in range(y0s.shape[0]):
        np.testing.assert_allclose(
            np.asarray(batched[i]), np.asarray(single(y0s[i])), rtol=1e-6, atol=1e-12
        )


def test_interpolation_accuracy():
    """Dense saveat output agrees with direct integration to each save time."""
    y0 = jnp.array([1.0, 0.5])

    def f(t, y, args):
        return jnp.array([y[1], -y[0]])  # harmonic oscillator

    saveat = jnp.linspace(0.0, 6.0, 50)
    sol = odesolve(f, Tsit5(), y0, 0.0, 6.0, saveat, rtol=1e-9, atol=1e-12)
    expected = jnp.stack(
        [y0[0] * jnp.cos(saveat) + y0[1] * jnp.sin(saveat),
         -y0[0] * jnp.sin(saveat) + y0[1] * jnp.cos(saveat)], axis=-1
    )
    np.testing.assert_allclose(np.asarray(sol.ys), np.asarray(expected), atol=1e-7)


def test_failure_reporting():
    """A blowing-up ODE reports success=False instead of crashing
    (reference prints 'ode solver failed', rober_crnn.jl:130-135)."""

    def f(t, y, args):
        return y**2

    sol = odesolve(
        f, Tsit5(), jnp.array([1.0]), 0.0, 2.0, jnp.array([2.0]),
        rtol=1e-6, atol=1e-9, max_steps=200, unroll="while",
    )
    assert not bool(sol.success)
    assert np.all(np.isfinite(np.asarray(sol.final_y)))

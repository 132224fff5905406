"""Gauss-Jordan inversion + the no-pivot wrong-inverse guard (ADVICE r3).

The pivot-free path (the training-epoch hot path — the pivoted variant's
traced-permutation gather was 26% of device time) can return a FINITE but
wrong inverse for a nonsingular matrix whose diagonal pivot crosses ~0
mid-elimination. ``inv_small_nopivot_minpiv`` surfaces min |pivot| so the
solvers force step rejection via ``pivot_ok``.
"""

import jax
import jax.numpy as jnp
import numpy as np

from crnn_tpu.ode.linsolve import (
    inv_small,
    inv_small_nopivot,
    inv_small_nopivot_minpiv,
    pivot_ok,
)


def test_nopivot_matches_pivoted_on_near_identity():
    rng = np.random.default_rng(0)
    a = jnp.eye(5) + 0.1 * jnp.asarray(rng.standard_normal((5, 5)))
    inv_p = inv_small(a)
    inv_np_, min_piv = inv_small_nopivot_minpiv(a)
    assert jnp.allclose(inv_p, inv_np_, rtol=1e-10, atol=1e-12)
    assert jnp.allclose(a @ inv_np_, jnp.eye(5), atol=1e-10)
    assert float(min_piv) > 0.5
    assert bool(pivot_ok(a, min_piv))


def test_nopivot_guard_flags_zero_diagonal_pivot():
    # nonsingular permutation-like matrix: pivoted GJ inverts it exactly,
    # the no-pivot path hits a 0 pivot -> garbage inverse, and the guard
    # must flag it (isfinite alone cannot: nan/inf appear, but a NEARLY
    # zero pivot below gives all-finite garbage).
    a = jnp.asarray([[0.0, 1.0], [1.0, 0.0]])
    assert jnp.allclose(inv_small(a) @ a, jnp.eye(2), atol=1e-12)
    _, min_piv = inv_small_nopivot_minpiv(a)
    assert not bool(pivot_ok(a, min_piv))


def test_nopivot_guard_flags_finite_but_wrong_inverse():
    # W with a tiny (1e-12) but nonzero diagonal entry: the no-pivot
    # inverse is FINITE yet numerically wrong — exactly the failure class
    # the guard exists for.
    a = jnp.asarray([[1e-12, 1.0], [1.0, 1.0]], dtype=jnp.float64)
    inv_raw, min_piv = inv_small_nopivot_minpiv(a)
    assert bool(jnp.all(jnp.isfinite(inv_raw)))  # isfinite can't catch it
    assert not bool(pivot_ok(a, min_piv))


def test_nopivot_guard_vmaps_per_lane():
    good = jnp.eye(3) + 0.05 * jnp.ones((3, 3))
    bad = jnp.asarray([[1e-13, 1.0, 0.0], [1.0, 0.0, 1.0], [0.0, 1.0, 1.0]])
    batch = jnp.stack([good, bad])
    inv_b, min_piv = jax.vmap(inv_small_nopivot_minpiv)(batch)
    ok = pivot_ok(batch, min_piv)
    assert ok.shape == (2,)
    assert bool(ok[0]) and not bool(ok[1])
    assert jnp.allclose(inv_b[0] @ good, jnp.eye(3), atol=1e-10)


def test_rosenbrock_rejects_bad_pivot_step():
    """A RHS whose Jacobian makes W_00 cross zero at large dt: the solver
    must still integrate correctly (rejection shrinks dt out of the bad
    pivot region)."""
    from crnn_tpu.ode import odesolve
    from crnn_tpu.ode.rosenbrock import Rosenbrock23

    # y' = +4*y0 (locally unstable direction) on species 0: W_00 = 1-4*h*d
    # crosses 0 at h*d = 0.25; the initial trial dt is free to land there.
    def f(t, y, args):
        return jnp.asarray([4.0 * y[0], -2.0 * y[1]])

    y0 = jnp.asarray([1.0, 1.0], dtype=jnp.float64)
    saveat = jnp.linspace(0.0, 1.0, 5)
    sol = odesolve(f, Rosenbrock23(), y0, 0.0, 1.0, saveat,
                   rtol=1e-8, atol=1e-10)
    expected = jnp.stack([jnp.exp(4.0 * saveat), jnp.exp(-2.0 * saveat)], -1)
    assert jnp.allclose(sol.ys, expected, rtol=1e-5)

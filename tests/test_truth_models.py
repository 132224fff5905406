"""Truth-model sanity: conservation laws and equilibria.

The synthetic ground truths must be faithful re-derivations of the
reference mechanisms; these tests pin their physics (mass conservation,
steady states) rather than comparing code.
"""

import jax.numpy as jnp
import numpy as np

from crnn_tpu.data.truth import (
    CASE1_K,
    CASE2_EA,
    CASE2_LOGA,
    CASE3_K,
    GRN_K,
    REVERSIBLE_K,
    ROBERTSON_K,
    case1_truth,
    case2_arrhenius,
    case2_truth,
    case3_truth,
    grn_truth,
    reversible_truth,
    robertson_truth,
)
from crnn_tpu.ode import Rosenbrock23, Tsit5, odesolve


def test_robertson_mass_conservation():
    y0 = jnp.array([1.0, 0.0, 0.0])
    sol = odesolve(robertson_truth, Rosenbrock23(), y0, 0.0, 1e5,
                   10 ** jnp.linspace(0, 5, 10), args=ROBERTSON_K,
                   rtol=1e-8, atol=1e-12, max_steps=8192, unroll="while")
    np.testing.assert_allclose(np.asarray(sol.ys.sum(-1)), 1.0, rtol=1e-6)


def test_case3_conservation_pairs():
    """MAPK: each kinase's total (inactive+active) is conserved; S constant."""
    y0 = jnp.full((9,), 0.1)
    sol = odesolve(case3_truth, Tsit5(), y0, 0.0, 10.0,
                   jnp.linspace(0, 10, 5), args=CASE3_K,
                   rtol=1e-9, atol=1e-12, unroll="while")
    ys = np.asarray(sol.ys)
    np.testing.assert_allclose(ys[:, 0], 0.1, rtol=1e-7)          # S frozen
    for a, b in [(1, 2), (3, 4), (5, 6), (7, 8)]:
        np.testing.assert_allclose(ys[:, a] + ys[:, b], 0.2, rtol=1e-7)


def test_reversible_equilibrium():
    """All-rates-1 reversible chain must relax towards detailed balance:
    fluxes vanish (A=B, B=C, C=D, C^2=D*E)."""
    y0 = jnp.array([1.0, 0.8, 0.2, 0.1, 0.05])
    sol = odesolve(reversible_truth, Tsit5(), y0, 0.0, 200.0,
                   jnp.array([200.0]), args=REVERSIBLE_K,
                   rtol=1e-9, atol=1e-12, max_steps=16384, unroll="while")
    a, b, c, d, e = np.asarray(sol.ys[-1])
    assert abs(a - b) < 1e-4 and abs(b - c) < 1e-4 and abs(c - d) < 1e-4
    assert abs(c * c - d * e) < 1e-4


def test_grn_dna_frozen():
    y0 = jnp.full((9,), 0.5)
    sol = odesolve(grn_truth, Tsit5(), y0, 0.0, 4.0, jnp.linspace(0, 4, 5),
                   args=GRN_K, rtol=1e-8, atol=1e-10, unroll="while")
    ys = np.asarray(sol.ys)
    for i in (0, 3, 6):
        np.testing.assert_allclose(ys[:, i], 0.5, rtol=1e-8)


def test_case2_stoichiometry_balance():
    """Transesterification: d(TG+DG+MG+GL)/dt = 0 and ester production
    equals alcohol consumption."""
    y = jnp.array([0.5, 1.0, 0.2, 0.1, 0.05, 0.3, 330.0])
    k = case2_arrhenius(CASE2_LOGA, CASE2_EA, y[-1])
    dy = np.asarray(case2_truth(0.0, y, k))
    np.testing.assert_allclose(dy[0] + dy[2] + dy[3] + dy[4], 0.0, atol=1e-7)
    np.testing.assert_allclose(dy[5], -dy[1], atol=1e-7)
    assert dy[6] == 0.0  # temperature frozen


def test_case1_element_balance():
    """A-units conserved: 2*(2A->B flux) tracked through B, C, D, E chains.
    Cheap invariant: total d/dt weighted by the known composition vanishes.
    Composition: A=1, B=2, C=1, D=1, E=3 (B+D -> E)."""
    y = jnp.array([0.5, 0.3, 0.2, 0.15, 0.1])
    dy = np.asarray(case1_truth(0.0, y, CASE1_K))
    weights = np.array([1.0, 2.0, 1.0, 1.0, 3.0])
    np.testing.assert_allclose(weights @ dy, 0.0, atol=1e-7)

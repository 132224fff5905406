"""Reaction-network DSL tests: parsing, mass action, truth-model parity."""

import jax.numpy as jnp
import numpy as np
import pytest

from crnn_tpu.data.reactions import ReactionNetwork
from crnn_tpu.data.truth import REVERSIBLE_K, reversible_truth
from crnn_tpu.uq.posterior import animate_particle_evolution


def test_parse_and_mass_action():
    net = ReactionNetwork(["A", "B", "C"])
    net.add("A + 2B -> C", kf=0.5)
    nu_react, nu_net = net.matrices()
    np.testing.assert_array_equal(np.asarray(nu_react[:, 0]), [1, 2, 0])
    np.testing.assert_array_equal(np.asarray(nu_net[:, 0]), [-1, -2, 1])
    f = net.rhs()
    y = jnp.array([2.0, 3.0, 0.1])
    dy = f(0.0, y, net.rates())
    rate = 0.5 * 2.0 * 3.0**2
    np.testing.assert_allclose(np.asarray(dy), [-rate, -2 * rate, rate],
                               rtol=1e-6)


def test_reversible_matches_handwritten_truth():
    """The DSL reproduction of 'case1 rev' equals the hand-derived RHS."""
    net = ReactionNetwork(["A", "B", "C", "D", "E"])
    net.add("A <-> B")
    net.add("B <-> C")
    net.add("C <-> D")
    net.add("2C <-> D + E")
    f = net.rhs()
    y = jnp.array([0.7, 0.5, 0.3, 0.2, 0.1])
    dy_dsl = f(0.0, y, net.rates())
    dy_ref = reversible_truth(0.0, y, REVERSIBLE_K)
    np.testing.assert_allclose(np.asarray(dy_dsl), np.asarray(dy_ref),
                               rtol=1e-6)


def test_zero_concentration_safe():
    net = ReactionNetwork(["A", "B"])
    net.add("2A -> B", kf=1.0)
    dy = net.rhs()(0.0, jnp.array([0.0, 0.0]), net.rates())
    np.testing.assert_array_equal(np.asarray(dy), [0.0, 0.0])


def test_parse_errors():
    net = ReactionNetwork(["A"])
    with pytest.raises(ValueError, match="unknown species"):
        net.add("A -> Z")
    with pytest.raises(ValueError, match="kb given"):
        net.add("A -> A", kf=1.0, kb=2.0)


def test_particle_animation(tmp_path):
    rng = np.random.default_rng(0)
    history = rng.standard_normal((4, 20, 5))
    path = str(tmp_path / "evo.gif")
    animate_particle_evolution(history, path, param_pair=(0, 1), fps=5)
    import os

    assert os.path.getsize(path) > 1000

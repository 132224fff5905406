"""Tiny reaction-network DSL for ground-truth models.

Replaces the reference's use of Catalyst.jl for truth definitions
("case1 rev"/case1.jl:37-43: ``@reaction_network begin (1.0,1.0), A <--> B
... end``): a string-based mass-action network builder that returns a pure
JAX RHS.

    net = ReactionNetwork(["A", "B", "C", "D", "E"])
    net.add("A <-> B", kf=1.0, kb=1.0)
    net.add("2C -> D + E", kf=0.5)
    rhs = net.rhs()            # f(t, y, k) with k = net.rates()

Stoichiometry is parsed once into (reactants, products) coefficient
matrices; the RHS is the standard mass-action law
``rate_j = k_j * prod_i y_i^nu_ij`` realised as exp/log-linear algebra —
the same structure the CRNN learns.
"""

from __future__ import annotations

import re
from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

_TERM = re.compile(r"^\s*(\d*)\s*([A-Za-z]\w*)\s*$")


def _parse_side(side: str, species_index: dict) -> np.ndarray:
    coeffs = np.zeros(len(species_index))
    for term in side.split("+"):
        term = term.strip()
        if not term or term == "0":
            continue
        m = _TERM.match(term)
        if not m:
            raise ValueError(f"cannot parse reaction term {term!r}")
        count = int(m.group(1)) if m.group(1) else 1
        name = m.group(2)
        if name not in species_index:
            raise ValueError(f"unknown species {name!r}")
        coeffs[species_index[name]] += count
    return coeffs


class ReactionNetwork:
    """Mass-action network from 'A + 2B -> C' / 'A <-> B' strings."""

    def __init__(self, species: Sequence[str]):
        self.species = list(species)
        self.index = {s: i for i, s in enumerate(self.species)}
        self._reactants: List[np.ndarray] = []
        self._products: List[np.ndarray] = []
        self._rates: List[float] = []

    def add(self, reaction: str, kf: float = 1.0, kb: float = None) -> "ReactionNetwork":
        if "<->" in reaction or "<-->" in reaction:
            lhs, rhs_side = re.split(r"<-+>", reaction)
            self._add_one(lhs, rhs_side, kf)
            self._add_one(rhs_side, lhs, kb if kb is not None else kf)
        else:
            lhs, rhs_side = reaction.split("->")
            if kb is not None:
                raise ValueError("kb given for an irreversible reaction")
            self._add_one(lhs, rhs_side, kf)
        return self

    def _add_one(self, lhs: str, rhs_side: str, k: float) -> None:
        self._reactants.append(_parse_side(lhs, self.index))
        self._products.append(_parse_side(rhs_side, self.index))
        self._rates.append(float(k))

    @property
    def n_reactions(self) -> int:
        return len(self._rates)

    def matrices(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(nu_react (ns, nr), nu_net (ns, nr)) stoichiometry matrices."""
        r = jnp.asarray(np.stack(self._reactants, axis=1))
        p = jnp.asarray(np.stack(self._products, axis=1))
        return r, p - r

    def rates(self) -> jnp.ndarray:
        return jnp.asarray(self._rates)

    def rhs(self, lb: float = 1e-30):
        """Pure mass-action RHS f(t, y, k). Zero-concentration species are
        handled by the power law directly (no log-space shortcut here —
        truth models must be exact at y = 0)."""
        nu_react, nu_net = self.matrices()

        def f(t, y, k):
            # rate_j = k_j * prod_i y_i^nu_react[i, j]
            powers = jnp.where(
                nu_react > 0,
                jnp.clip(y, 0.0, jnp.inf)[:, None] ** nu_react,
                1.0,
            )
            rates = k * jnp.prod(powers, axis=0)
            return nu_net @ rates

        return f

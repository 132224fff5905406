"""Ground-truth ODE systems used to synthesise training data.

Each function is the mass-action law of the corresponding reference case,
written fresh as a pure JAX RHS ``f(t, y, k) -> dy/dt`` (the reference uses
in-place Julia ``trueODEfunc(dydt, y, k, t)`` variants; citations inline).
"""

from __future__ import annotations

import jax.numpy as jnp


def case1_truth(t, y, k):
    """5 species / 4 reactions, isothermal (case1/case1.jl:38-44):
    2A->B (r~A^2), A->C, C->D, B+D->E."""
    r1 = k[0] * y[0] ** 2
    r2 = k[1] * y[0]
    r3 = k[2] * y[2]
    r4 = k[3] * y[1] * y[3]
    return jnp.stack([
        -2.0 * r1 - r2,
        r1 - r4,
        r2 - r3,
        r3 - r4,
        r4,
    ])


CASE1_K = jnp.array([0.1, 0.2, 0.13, 0.3])


def case2_truth(t, y, k):
    """Biodiesel transesterification, 6 species + T (case2/case2.jl:37-51).
    k are the Arrhenius rate constants at this experiment's temperature;
    the last state is T with dT/dt = 0."""
    r1 = k[0] * y[0] * y[1]
    r2 = k[1] * y[2] * y[1]
    r3 = k[2] * y[3] * y[1]
    return jnp.stack([
        -r1,
        -r1 - r2 - r3,
        r1 - r2,
        r2 - r3,
        r3,
        r1 + r2 + r3,
        jnp.zeros((), y.dtype),
    ])


CASE2_LOGA = jnp.array([18.60, 19.13, 7.93])
CASE2_EA = jnp.array([14.54, 14.42, 6.47])  # kcal/mol


def case2_arrhenius(log_a, ea, temp):
    """k = exp(logA) * exp(-Ea/(R T)) (case2/case2.jl:55-59)."""
    r = 1.98720425864083e-3
    return jnp.exp(log_a) * jnp.exp(-ea / r / temp)


def case3_truth(t, y, k):
    """MAPK cascade, 9 species / 8 reactions (case3/case3.jl:83-103)."""
    r1 = k[0] * y[0] * y[1]
    r2 = k[1] * y[2] * y[3]
    r3 = k[2] * y[4] * y[5]
    r4 = k[3] * y[6] * y[7]
    r5 = k[4] * y[2]
    r6 = k[5] * y[4]
    r7 = k[6] * y[6]
    r8 = k[7] * y[8]
    z = jnp.zeros((), y.dtype)
    return jnp.stack([
        z,
        -r1 + r5,
        r1 - r5,
        -r2 + r6,
        r2 - r6,
        -r3 + r7,
        r3 - r7,
        -r4 + r8,
        r4 - r8,
    ])


CASE3_K = jnp.ones(8)


def robertson_truth(t, y, k):
    """Robertson stiff problem (robertson/rober_crnn.jl:54-61)."""
    r1 = k[0] * y[0]
    r2 = k[1] * y[1] * y[1]
    r3 = k[2] * y[1] * y[2]
    return jnp.stack([-r1 + r3, r1 - r2 - r3, r2])


ROBERTSON_K = jnp.array([4e-2, 3e7, 1e4])


def reversible_truth(t, y, k):
    """case1 rev truth: A<->B, B<->C, C<->D, 2C<->D+E, all rates 1
    (case1 rev/case1.jl:37-43, Catalyst mass action)."""
    a, b, c, d, e = y[0], y[1], y[2], y[3], y[4]
    r1 = k[0] * a - k[1] * b
    r2 = k[2] * b - k[3] * c
    r3 = k[4] * c - k[5] * d
    r4 = k[6] * c**2 - k[7] * d * e
    return jnp.stack([
        -r1,
        r1 - r2,
        r2 - r3 - 2.0 * r4,
        r3 + r4,
        r4,
    ])


REVERSIBLE_K = jnp.ones(8)


def grn_truth(t, y, k):
    """Repressilator-like gene regulatory network, 9 species / 15 reactions
    (gene-regulatory.jl:77-129). DNA species (0,3,6) are constant."""
    r = [
        k[0] * y[0], k[1] * y[1], k[2] * y[1], k[3] * y[2],
        k[4] * y[3], k[5] * y[4], k[6] * y[4], k[7] * y[5],
        k[8] * y[6], k[9] * y[7], k[10] * y[7], k[11] * y[8],
        k[12] * y[7] * y[2],   # mRNA_C + A -> A
        k[13] * y[4] * y[8],   # mRNA_B + C -> C
        k[14] * y[1] * y[5],   # mRNA_A + B -> B
    ]
    z = jnp.zeros((), y.dtype)
    return jnp.stack([
        z,
        r[0] - r[2] - r[14],
        r[1] - r[3],
        z,
        r[4] - r[6] - r[13],
        r[5] - r[7],
        z,
        r[8] - r[10] - r[12],
        r[9] - r[11],
    ])


GRN_K = jnp.array([1.8, 2.1, 1.3, 1.5, 2.2, 2.0, 2.0, 2.5, 3.2, 3.0, 2.3, 2.5, 6.0, 4.0, 3.0])


def yeast_truth(t, y, k):
    """Yeast glycolysis 7-species reduced model
    (yeast_glycolysis.jl:41-66). Constants q, K1, A, N, J0, phi inline."""
    q, big_k1, big_a, big_n, j0, phi = 4.0, 0.52, 4.0, 1.0, 2.5, 0.1
    r1 = k[0] * y[0] * y[5] / (1.0 + (y[5] / big_k1) ** q)
    r2 = k[1] * y[1] * (big_n - y[4])
    r3 = k[2] * y[2] * (big_a - y[5])
    r4 = k[3] * y[3] * y[4]
    r5 = k[4] * y[5]
    r6 = k[5] * y[1] * y[4]
    r7 = 13.0 * y[6]
    r8 = 13.0 * (y[3] - y[6])
    return jnp.stack([
        j0 - r1,
        2.0 * r1 - r2 - r6,
        r2 - r3,
        r3 - r4 - r8,
        r2 - r4 - r6,
        -2.0 * r1 + 2.0 * r3 - r5,
        phi * r8 - r7,
    ])


YEAST_K = jnp.array([100.0, 6.0, 16.0, 100.0, 1.28, 12.0])
YEAST_IC_LB = jnp.array([0.15, 1.19, 0.04, 0.10, 0.08, 0.14, 0.05])
YEAST_IC_UB = jnp.array([1.60, 2.16, 0.20, 0.35, 0.30, 2.67, 0.10])


TRUTH_REGISTRY = {
    "case1": (case1_truth, CASE1_K),
    "case2": (case2_truth, None),  # per-experiment Arrhenius k
    "case3": (case3_truth, CASE3_K),
    "robertson": (robertson_truth, ROBERTSON_K),
    "reversible": (reversible_truth, REVERSIBLE_K),
    "grn": (grn_truth, GRN_K),
    "yeast": (yeast_truth, YEAST_K),
}

"""Parameter-vector -> physical-weight transforms (the "p2vec" registry).

The reference re-implements a `p2vec` in every script, with seven distinct
constraint patterns (SURVEY.md §2.2). Here each is a pure function from the
flat trainable vector to a `CRNNWeights` pytree; the RHS functions in
`crnn_tpu.models` consume the pytree. No globals — gradients flow
`p -> weights -> solve -> loss` explicitly.

Variant map (reference citation -> function):
- case1/case1.jl:70-78      sign-tied, fixed bias offset      -> p2vec_case1
- case2/case2.jl:91-99      Arrhenius w/ learnable slope      -> p2vec_case2
- case3/case3.jl:42-53      product-tied |w_out|              -> p2vec_case3
  (gene-regulatory.jl:39-50 adds frozen w_out rows via `frozen_rows`)
- robertson/rober_crnn.jl:80-92  product-tied 10^w_out, slope -> p2vec_robertson
- case1 rev/case1.jl:72-78  reversible shared w_out           -> p2vec_reversible
- yeast_glycolysis.jl:108-115  hidden species + influx w_J    -> p2vec_yeast
- Cathode/src/network.jl:27-50 scalar extended-Arrhenius      -> p2vec_cathode
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp


class CRNNWeights(NamedTuple):
    """Physical CRNN weights. Not every field is used by every variant."""

    w_in: jnp.ndarray            # (n_features, nr) reaction orders (+Ea rows)
    w_b: jnp.ndarray             # (nr,) log rate-constant bias
    w_out: jnp.ndarray           # (ns, nr) stoichiometric coefficients
    w_kb: Optional[jnp.ndarray] = None   # reversible: backward log-k
    w_J: Optional[jnp.ndarray] = None    # yeast: learned constant influx
    extra: Optional[dict] = None         # cathode: named scalar groups


# --------------------------------------------------------------------------
# case1: isothermal, sign-tied w_in = clamp(-w_out, 0, 2.5), w_b = p + b0
# --------------------------------------------------------------------------

def p2vec_case1(p: jnp.ndarray, ns: int, nr: int, b0: float = -10.0,
                w_in_clip: float = 2.5) -> CRNNWeights:
    w_b = p[:nr] + b0
    w_out = p[nr:].reshape(ns, nr)
    w_in = jnp.clip(-w_out, 0.0, w_in_clip)
    return CRNNWeights(w_in=w_in, w_b=w_b, w_out=w_out)


def init_params_case1(key, ns: int, nr: int, scale: float = 0.1,
                      dtype=jnp.float32) -> jnp.ndarray:
    return scale * jax.random.normal(key, (nr * (ns + 1),), dtype)


# --------------------------------------------------------------------------
# case2: Arrhenius. p = [w_b(nr) | w_out(ns*nr) | w_in_Ea(nr) | slope]
# --------------------------------------------------------------------------

def p2vec_case2(p: jnp.ndarray, ns: int, nr: int,
                w_in_clip: float = 4.0) -> CRNNWeights:
    slope = p[nr * (ns + 2)] * 100.0
    w_b = p[:nr] * slope
    w_out = p[nr:nr * (ns + 1)].reshape(ns, nr)
    w_in_ea = jnp.abs(p[nr * (ns + 1):nr * (ns + 2)] * slope)
    w_in = jnp.clip(-w_out, 0.0, w_in_clip)
    w_in = jnp.concatenate([w_in, w_in_ea[None, :]], axis=0)  # (ns+1, nr)
    return CRNNWeights(w_in=w_in, w_b=w_b, w_out=w_out)


def init_params_case2(key, ns: int, nr: int, dtype=jnp.float32) -> jnp.ndarray:
    """Reference init: N(0, 0.1), +0.8 on w_b and w_in_Ea blocks, slope=0.1
    (case2/case2.jl:85-89)."""
    n = nr * (ns + 2) + 1
    p = 0.1 * jax.random.normal(key, (n,), dtype)
    p = p.at[:nr].add(0.8)
    p = p.at[nr * (ns + 1):nr * (ns + 2)].add(0.8)
    p = p.at[-1].set(0.1)
    return p


# --------------------------------------------------------------------------
# case3 / GRN: product-tied w_out = -w_in * |w_out_raw|; optional frozen rows
# p = [w_b(nr) | w_out(ns*nr) | w_in(ns*nr) | slope(unused)]
# --------------------------------------------------------------------------

def p2vec_case3(p: jnp.ndarray, ns: int, nr: int, w_in_clip: float = 4.0,
                frozen_rows: Optional[Sequence[int]] = None) -> CRNNWeights:
    w_b = p[:nr]
    w_out_raw = p[nr:nr * (ns + 1)].reshape(ns, nr)
    w_in = p[nr * (ns + 1):nr * (2 * ns + 1)].reshape(ns, nr)
    if frozen_rows is not None:
        # GRN freezes DNA species: w_out rows zeroed BEFORE the product tie
        # (gene-regulatory.jl:44), so those species are never produced/consumed.
        mask = jnp.ones((ns, 1), p.dtype).at[jnp.asarray(frozen_rows), :].set(0.0)
        w_out_raw = w_out_raw * mask
    w_out = -w_in * jnp.abs(w_out_raw)
    w_in = jnp.clip(w_in, 0.0, w_in_clip)
    return CRNNWeights(w_in=w_in, w_b=w_b, w_out=w_out)


def init_params_case3(key, ns: int, nr: int, dtype=jnp.float32) -> jnp.ndarray:
    """Xavier-style uniform: U(-1,1) * sqrt(6/(ns+nr)), slope=0.1
    (case3/case3.jl:34-36)."""
    n = nr * (2 * ns + 1) + 1
    lim = (6.0 / (ns + nr)) ** 0.5
    p = jax.random.uniform(key, (n,), dtype, -lim, lim)
    return p.at[-1].set(0.1)


# --------------------------------------------------------------------------
# robertson: w_out = -w_in * 10^w_out_raw, slope-scaled bias
# --------------------------------------------------------------------------

def p2vec_robertson(p: jnp.ndarray, ns: int, nr: int,
                    w_in_clip: float = 2.5) -> CRNNWeights:
    slope = jnp.abs(p[-1])
    w_b = p[:nr] * (10.0 * slope)
    w_in = p[nr * (ns + 1):nr * (2 * ns + 1)].reshape(ns, nr)
    w_out_raw = p[nr:nr * (ns + 1)].reshape(ns, nr)
    w_out = -w_in * 10.0**w_out_raw
    w_in = jnp.clip(w_in, 0.0, w_in_clip)
    return CRNNWeights(w_in=w_in, w_b=w_b, w_out=w_out)


def init_params_robertson(key, ns: int, nr: int, dtype=jnp.float64) -> jnp.ndarray:
    """U(-1,1)*sqrt(6/(ns+nr)), slope=0.1 (rober_crnn.jl:37-39)."""
    n = nr * (2 * ns + 1) + 1
    lim = (6.0 / (ns + nr)) ** 0.5
    p = jax.random.uniform(key, (n,), dtype, -lim, lim)
    return p.at[-1].set(0.1)


# --------------------------------------------------------------------------
# case1 rev: reversible pairs sharing w_out; Kc = 1 (w_kb = w_kf)
# --------------------------------------------------------------------------

def p2vec_reversible(p: jnp.ndarray, ns: int, nr: int,
                     w_out_clip: float = 2.5) -> CRNNWeights:
    w_kf = p[:nr]
    w_out = jnp.clip(p[nr:].reshape(ns, nr), -w_out_clip, w_out_clip)
    # forward/backward reaction orders derived from w_out inside the RHS
    return CRNNWeights(w_in=w_out, w_b=w_kf, w_out=w_out, w_kb=w_kf)


def init_params_reversible(key, ns: int, nr: int, dtype=jnp.float32) -> jnp.ndarray:
    return 0.5 * jax.random.normal(key, (nr * (ns + 1),), dtype)


# --------------------------------------------------------------------------
# yeast: hidden species (ns_ total, ns observed) + learned influx w_J
# p = [w_b(nr) | w_out(ns_*nr) | w_J(ns) | slope]
# --------------------------------------------------------------------------

def p2vec_yeast(p: jnp.ndarray, ns: int, ns_: int, nr: int,
                w_in_clip: float = 4.0) -> CRNNWeights:
    np_ = nr * (ns_ + 1) + ns + 1
    slope = p[np_ - 1] * 100.0
    w_b = p[:nr] * slope
    w_out = p[nr:nr * (ns_ + 1)].reshape(ns_, nr)
    w_in = jnp.clip(-w_out, 0.0, w_in_clip)
    w_J = p[nr * (ns_ + 1):np_ - 1]
    return CRNNWeights(w_in=w_in, w_b=w_b, w_out=w_out, w_J=w_J)


def init_params_yeast(key, ns: int, ns_: int, nr: int, dtype=jnp.float32) -> jnp.ndarray:
    """U(-1,1)*sqrt(6/(ns_+nr)), slope=0.1 (yeast_glycolysis.jl:104-106)."""
    n = nr * (ns_ + 1) + ns + 1
    lim = (6.0 / (ns_ + nr)) ** 0.5
    p = jax.random.uniform(key, (n,), dtype, -lim, lim)
    return p.at[-1].set(0.1)


# --------------------------------------------------------------------------
# Cathode: 17 named kinetic scalars + slope (extended Arrhenius DSC model)
# p = [lnA(3) | Ea(3) | b(3) | delH(3) | order(3) | nu(2) | slope]
# --------------------------------------------------------------------------

def p2vec_cathode(p: jnp.ndarray) -> CRNNWeights:
    slope = p[17] * 10.0
    w_A = jnp.clip(p[0:3] * (slope * 20.0), 0.0, 50.0)
    w_in_ea = jnp.clip(jnp.abs(p[3:6]), 0.0, 3.0)
    w_in_b = p[6:9]
    w_delH = jnp.clip(jnp.abs(p[9:12]) * 100.0, 10.0, 300.0)
    w_in_order = jnp.clip(p[12:15], 0.01, 10.0)
    w_out_nu = jnp.clip(
        jnp.concatenate([jnp.ones((1,), p.dtype), p[15:17]]), 0.01, 5.0
    )
    return CRNNWeights(
        w_in=w_in_order,
        w_b=w_A,
        w_out=w_out_nu,
        extra={"Ea": w_in_ea, "b": w_in_b, "delH": w_delH},
    )


def init_params_cathode(key, dtype=jnp.float64) -> jnp.ndarray:
    """N(0, 0.01) with physically-informed offsets (Cathode/src/network.jl:9-25)."""
    p = 0.01 * jax.random.normal(key, (18,), dtype)
    p = p.at[0:3].add(1.0)                                  # lnA
    p = p.at[3:6].add(jnp.asarray([1.0, 1.1, 1.2], dtype))  # Ea ordering
    p = p.at[9].add(1.0)                                    # delH
    p = p.at[10].add(0.2)
    p = p.at[11].add(0.3)
    p = p.at[12:15].add(1.0)                                # reaction orders
    p = p.at[15:17].add(1.0)                                # stoich nu
    p = p.at[17].set(0.1)                                   # slope
    return p

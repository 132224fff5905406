"""Tiny MLP as a raw pytree — the hybrid-model building block.

Replaces the reference's Flux ``Chain(Dense(...), ...)`` +
``Flux.destructure`` pattern (yeast_glycolysis.jl:129-136,
rober_crnn_qssa.jl:112-120). Params live in a list-of-dicts pytree that
concatenates naturally with the CRNN parameter vector for joint training.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

_ACT = {
    "gelu": jax.nn.gelu,
    "softplus": jax.nn.softplus,
    "exp": jnp.exp,
    "tanh": jnp.tanh,
    "identity": lambda x: x,
}


def mlp_init(key, sizes: Sequence[int], activations: Sequence[str],
             dtype=jnp.float32):
    """Glorot-uniform init. sizes = [in, h1, ..., out];
    activations has len(sizes)-1 entries (applied after each Dense)."""
    assert len(activations) == len(sizes) - 1
    layers = []
    for i, (fan_in, fan_out) in enumerate(zip(sizes[:-1], sizes[1:])):
        key, sub = jax.random.split(key)
        lim = jnp.sqrt(6.0 / (fan_in + fan_out))
        w = jax.random.uniform(sub, (fan_out, fan_in), dtype, -lim, lim)
        b = jnp.zeros((fan_out,), dtype)
        layers.append({"w": w, "b": b, "act": activations[i]})
    # store activations statically on the side: pytree leaves must be arrays
    params = [{"w": l["w"], "b": l["b"]} for l in layers]
    return params, tuple(activations)


def mlp_apply(params_and_acts, x):
    """Apply an MLP. Accepts either (params, acts) or a bare params list
    with activations attached via make_mlp."""
    params, acts = params_and_acts
    h = x
    for layer, act in zip(params, acts):
        h = _ACT[act](layer["w"] @ h + layer["b"])
    return h


def make_mlp(key, sizes: Sequence[int], activations: Sequence[str],
             dtype=jnp.float32):
    """Returns (params, apply_fn) where apply_fn(params, x) closes over the
    static activation spec."""
    params, acts = mlp_init(key, sizes, activations, dtype)

    def apply_fn(p, x):
        return mlp_apply((p, acts), x)

    return params, apply_fn

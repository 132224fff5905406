"""Trajectory losses: scaled MAE / MSE / log-MAE with masking.

Rebuilds the reference's loss layer (case2/case2.jl:132-137 scaled MAE;
case3/case3.jl:183-190 log-space MAE; case2_missing.jl:165 observed-species
subset; robertson/rober_crnn.jl:218 stochastic prefix horizons) as one
configurable pure function. Prefix horizons are realised as masks under
fixed-length solves — JAX static shapes, no ragged arrays.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp


def make_trajectory_loss(
    kind: str = "mae",
    yscale: Optional[jnp.ndarray] = None,
    i_obs: Optional[Sequence[int]] = None,
    clip_lb: Optional[float] = None,
    clip_ub: Optional[float] = None,
) -> Callable:
    """Build loss_fn(pred, data, horizon_mask=None) -> scalar.

    pred/data: (n_save, n_obs_total). i_obs selects observed species
    (case2_missing). kind:
      - 'mae':     mean |pred/ys - data/ys|
      - 'mse':     mean (pred/ys - data/ys)^2
      - 'log_mae': mean |log(clip(pred)) - log(clip(data))| (case3)
    horizon_mask: optional (n_save,) 0/1 weights for prefix batching.
    """
    obs = None if i_obs is None else jnp.asarray(i_obs)

    def loss_fn(pred, data, horizon_mask=None):
        p, d = pred, data
        if obs is not None:
            p = p[:, obs]
            d = d[:, obs]
        if kind == "log_mae":
            p = jnp.log(jnp.clip(p, clip_lb, clip_ub))
            d = jnp.log(jnp.clip(d, clip_lb, clip_ub))
        elif yscale is not None:
            ys = yscale if obs is None else yscale[obs]
            p = p / ys
            d = d / ys
        err = jnp.abs(p - d) if kind in ("mae", "log_mae") else (p - d) ** 2
        if horizon_mask is None:
            return jnp.mean(err)
        w = horizon_mask[:, None]
        return jnp.sum(err * w) / (jnp.sum(w) * err.shape[1])

    return loss_fn


def prefix_mask(n_save: int, sample: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """0/1 mask selecting the first ``sample`` save points (stochastic
    truncated horizons, rober_crnn.jl:218: sample = rand(batchsize:datasize))."""
    return (jnp.arange(n_save) < sample).astype(dtype)

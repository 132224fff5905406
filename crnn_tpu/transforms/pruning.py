"""Weight pruning: hard-threshold and relative-to-rowmax masks.

Reference behaviours rebuilt:
- case1_hardthreshhold.jl:74-77 / case2_pruning.jl:105-106 — zero entries of
  ``w_out`` with |w| < p_cutoff inside p2vec, before the sign-tie.
- case3_pruning.jl:243-248 — normalise ``w_out' * dy_std`` rows to max 1 and
  zero scaled entries < p_cutoff; also prune ``w_in`` below cutoff.

These are implemented as weight-pytree -> weight-pytree transforms so they
compose with any p2vec variant: ``weights = prune(p2vec(p))``. They are
differentiable (mask is stop-gradient constant), so pruned fine-tuning
(case1_hardthreshhold.jl:217-236) works out of the box.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from crnn_tpu.transforms.p2vec import CRNNWeights


def hard_threshold(w: jnp.ndarray, cutoff: float) -> jnp.ndarray:
    """Zero entries with |w| < cutoff (mask is non-differentiable)."""
    mask = jax.lax.stop_gradient((jnp.abs(w) >= cutoff).astype(w.dtype))
    return w * mask


def relative_threshold(w_out: jnp.ndarray, dy_scale: jnp.ndarray,
                       cutoff: float) -> jnp.ndarray:
    """case3-style pruning: scale each reaction row of (w_out.T * dy_scale)
    by its row max, zero |scaled| < cutoff (case3_pruning.jl:243-248)."""
    w_scaled = w_out.T * dy_scale[None, :]                  # (nr, ns)
    rowmax = jnp.max(w_scaled, axis=1, keepdims=True)
    w_rel = w_scaled / rowmax
    mask = jax.lax.stop_gradient((jnp.abs(w_rel) >= cutoff).astype(w_out.dtype)).T
    return w_out * mask


def prune_case2_params(p: jnp.ndarray, ns: int, nr: int,
                       cutoff: float) -> jnp.ndarray:
    """Prune the raw w_out block of a case1/case2-layout parameter vector.

    Matches the reference exactly: the cutoff is applied to the RAW w_out
    entries before the w_in sign-tie (case2_pruning.jl:100-113), so pruned
    reactions lose both their product stoichiometry and their reactant order.
    """
    w_out_flat = p[nr:nr * (ns + 1)]
    return p.at[nr:nr * (ns + 1)].set(hard_threshold(w_out_flat, cutoff))


def apply_w_out_cutoff(weights: CRNNWeights, cutoff: Optional[float]) -> CRNNWeights:
    """Convenience wrapper used by case configs when `p_cutoff > 0`."""
    if cutoff is None or cutoff <= 0:
        return weights
    return weights._replace(w_out=hard_threshold(weights.w_out, cutoff))

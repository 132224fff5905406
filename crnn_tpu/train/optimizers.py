"""Optimizer builders mapping the reference's Flux setups onto optax.

Reference usages rebuilt (SURVEY.md §2.2 "Optimizers / schedules"):
- ADAMW(lr, (b1,b2), wd)                      case1/case2/robertson/...
  Flux's ADAMW couples weight decay into the gradient (ADAM + WeightDecay),
  so we mirror with add_decayed_weights + adam rather than decoupled adamw.
- NADAM(lr, (b1,b2))                          case3/case3.jl:20
- Optimiser(ExpDecay(lr0, rate, steps, floor), ADAMW(...))
                                              case2/case2.jl:31-32
- gradient-norm clipping at grad_max          rober_crnn.jl:221-223,
                                              Cathode/src/crnn_cathode.jl:18-21
  (reference clips by RESCALING to grad_max when the norm exceeds it, which
  is exactly optax.clip_by_global_norm.)
"""

from __future__ import annotations

from typing import Optional

import optax


def _maybe_clip(tx: optax.GradientTransformation,
                grad_max: Optional[float]) -> optax.GradientTransformation:
    if grad_max is None:
        return tx
    return optax.chain(optax.clip_by_global_norm(grad_max), tx)


def adamw_like(lr: float, b1: float = 0.9, b2: float = 0.999,
               weight_decay: float = 0.0,
               grad_max: Optional[float] = None) -> optax.GradientTransformation:
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.adam(lr, b1=b1, b2=b2),
    )
    return _maybe_clip(tx, grad_max)


def nadam_like(lr: float, b1: float = 0.9, b2: float = 0.999,
               grad_max: Optional[float] = None) -> optax.GradientTransformation:
    return _maybe_clip(optax.nadam(lr, b1=b1, b2=b2), grad_max)


def expdecay_adamw(lr0: float, decay_rate: float, decay_steps: int,
                   lr_floor: float, b1: float = 0.9, b2: float = 0.999,
                   weight_decay: float = 0.0,
                   grad_max: Optional[float] = None) -> optax.GradientTransformation:
    """Staircase exponential lr decay floored at lr_floor, composed with the
    coupled-decay Adam (case2/case2.jl:31-32, yeast_glycolysis.jl:39-40)."""
    schedule = optax.exponential_decay(
        init_value=lr0,
        transition_steps=decay_steps,
        decay_rate=decay_rate,
        staircase=True,
        end_value=lr_floor,
    )
    tx = optax.chain(
        optax.add_decayed_weights(weight_decay) if weight_decay else optax.identity(),
        optax.adam(schedule, b1=b1, b2=b2),
    )
    return _maybe_clip(tx, grad_max)

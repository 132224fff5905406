"""Checkpoint / restart: msgpack serialization of the full training state.

Replaces the reference's BSON ``@save/@load`` of
``p, opt, loss_histories, iter`` keyed by an ``is_restart`` flag
(case2/case2.jl:178,183-186; best-params tracking
Cathode/src/callback.jl:122-126). The checkpoint stores the optax state and
histories so restarts resume bit-exact.
"""

from __future__ import annotations

import os
from typing import Any

import jax
from flax import serialization


def save_checkpoint(path: str, state: Any) -> None:
    """Serialize a pytree (TrainState, histories, ...) to ``path``."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    data = serialization.to_bytes(jax.device_get(state))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: a crash never corrupts the checkpoint


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of ``target`` (same pytree/shapes)."""
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())

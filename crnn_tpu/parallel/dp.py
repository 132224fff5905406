"""Data-parallel training over a device mesh via shard_map.

The experiments (and SVGD particles) dimension is the framework's batch
axis. Each device solves its shard of experiments, computes the local mean
loss/gradient, and a ``pmean`` over the mesh axis (lowered to an ICI
all-reduce by XLA) yields the global gradient; parameters stay replicated.
This replaces nothing in the reference (it has no distributed backend,
SURVEY.md §2.2) — it is the scaling path for batch counts beyond one chip.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_dp_train_step(
    loss_on_data: Callable,   # (params, u0_i, ys_i, mask_i) -> scalar
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    axis_name: str = "exp",
) -> Callable:
    """Build a jitted data-parallel train step.

    step(params, opt_state, u0s, yss, masks, weights) -> (params, opt_state,
    loss, grad_norm). Batch arrays must be sharded (or shardable) on axis 0
    over the mesh; ``weights`` carries 0 for padded lanes.
    """

    def local_loss_and_grad(params, u0_l, ys_l, mask_l, wgt_l):
        # Differentiate the LOCAL weighted loss sum, then reduce explicitly.
        # Do NOT differentiate through psum: with check_vma=False the
        # transpose of psum inside shard_map is not replication-aware, and
        # grad(psum(s)/psum(n)) silently yields each device's LOCAL chunk
        # gradient instead of the global mean (caught by
        # tests/test_scale_demo.py at 256 experiments / 8 devices).
        def local_sum(p):
            losses = jax.vmap(loss_on_data, in_axes=(None, 0, 0, 0))(
                p, u0_l, ys_l, mask_l
            )
            return jnp.sum(losses * wgt_l)

        s, g_local = jax.value_and_grad(local_sum)(params)
        n = jax.lax.psum(jnp.sum(wgt_l), axis_name)
        loss = jax.lax.psum(s, axis_name) / n
        g = jax.tree.map(
            lambda x: jax.lax.psum(x, axis_name) / n, g_local
        )
        return loss, g

    smapped = jax.shard_map(
        local_loss_and_grad,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, u0s, yss, masks, weights):
        loss, g = smapped(params, u0s, yss, masks, weights)
        grad_norm = optax.global_norm(g)
        updates, new_opt_state = optimizer.update(g, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # divergence guard (same policy as Trainer.guarded_epoch_fn): a
        # non-finite loss/grad epoch must not poison the replicated params
        # — discard the update, report the bad loss for observability
        ok = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
        keep = lambda a, b: jnp.where(ok, a, b)  # noqa: E731
        params = jax.tree.map(keep, new_params, params)
        opt_state = jax.tree.map(keep, new_opt_state, opt_state)
        return params, opt_state, loss, grad_norm

    return step


def make_dp_eval(
    loss_on_data: Callable,
    mesh: Mesh,
    axis_name: str = "exp",
) -> Callable:
    """Batched per-experiment loss evaluation, sharded over the mesh.
    Returns eval(params, u0s, yss, masks) -> (n_exp,) losses (replicated).

    If ``loss_on_data`` accepts an ``unroll`` kwarg (the case-module
    convention), the gradient-free eval requests the early-exiting while
    driver instead of paying the fixed max_steps scan."""
    import inspect

    try:
        accepts_unroll = "unroll" in inspect.signature(
            loss_on_data).parameters
    except (TypeError, ValueError):  # builtins/partials without signature
        accepts_unroll = False
    if accepts_unroll:
        def eval_loss(p, u0_i, ys_i, mask_i):
            return loss_on_data(p, u0_i, ys_i, mask_i, unroll="while")
    else:
        eval_loss = loss_on_data

    def local_eval(params, u0_l, ys_l, mask_l):
        losses = jax.vmap(eval_loss, in_axes=(None, 0, 0, 0))(
            params, u0_l, ys_l, mask_l
        )
        return losses

    smapped = jax.shard_map(
        local_eval,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        check_vma=False,
    )
    return jax.jit(smapped)

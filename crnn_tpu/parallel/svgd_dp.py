"""SVGD over a device mesh: particles sharded, kernel algebra replicated.

The SVGD update couples all particles through the (n, n) RBF kernel, but
the expensive part — per-particle solve + gradient — is embarrassingly
parallel. Strategy: shard the particle axis for the score computation
(each device solves its particle shard), all_gather the (n, d) particles
and (n, d) scores (tiny: n*d <= 100*17 floats), and compute the kernel
update replicated. Communication is two small all-gathers per iteration
over ICI — negligible next to the solves.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from crnn_tpu.uq.svgd import rbf_kernel


def make_dp_svgd_step(value_and_grad_one: Callable, mesh: Mesh,
                      axis_name: str = "exp") -> Callable:
    """Build a jitted sharded SVGD step.

    value_and_grad_one(particle, i_exp) -> (loss, grad) for ONE particle.
    Returns step(particles, i_exp, stepsize, normalizer) ->
    (new_particles, mean_loss); particles (n, d) must divide the mesh.
    """

    def local_scores(p_shard, i_exp, normalizer):
        losses, grads = jax.vmap(value_and_grad_one, in_axes=(0, None))(
            p_shard, i_exp
        )
        return losses, -grads / normalizer**2

    smapped = jax.shard_map(
        local_scores,
        mesh=mesh,
        in_specs=(P(axis_name), P(), P()),
        out_specs=(P(axis_name), P(axis_name)),
        check_vma=False,
    )

    @jax.jit
    def step(particles, i_exp, stepsize, normalizer):
        losses, lnpgrad = smapped(particles, i_exp, normalizer)
        # failed-solve tolerance: non-finite scores contribute no data force
        finite = jnp.isfinite(lnpgrad).all(axis=1, keepdims=True)
        lnpgrad = jnp.where(finite, lnpgrad, 0.0)
        kxy, dxkxy = rbf_kernel(particles)
        phi = (kxy @ lnpgrad + dxkxy) / particles.shape[0]
        phi = jnp.where(jnp.isfinite(phi), phi, 0.0)
        return particles + stepsize * phi, jnp.nanmean(
            jnp.where(jnp.isfinite(losses), losses, jnp.nan))

    return step

"""SVGD: Stein Variational Gradient Descent over CRNN parameters.

TPU-native rebuild of the Cathode_NCM333_UQ engine
(/root/reference/Cathode_NCM333_UQ/src_333/network.jl:48-87,
crnn_cathode.jl:23-78): a particle ensemble approximates the Bayesian
posterior over kinetic parameters; each iteration computes per-particle
log-probability gradients, smooths them with an RBF kernel (median-trick
bandwidth) and adds the kernel-gradient repulsion term:

    phi(x_i) = (1/n) sum_j [ k(x_j, x_i) grad_logp(x_j) + grad_{x_j} k(x_j, x_i) ]
    x_i <- x_i + stepsize * phi(x_i)

The reference evaluates the 100 particles' gradients SERIALLY with
ForwardDiff (network.jl:227); here the particle axis is a vmap dimension —
one batched solve evaluates every particle (x experiments) simultaneously,
and the pairwise-kernel algebra is two small matmuls that sit happily on
the MXU. Particles shard over the device mesh for multi-chip scaling.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclass
class SVGDConfig:
    stepsize: float = 1e-3
    bandwidth: Optional[float] = None   # None -> median trick (network.jl:71-76)


def rbf_kernel(particles: jnp.ndarray,
               bandwidth: Optional[float] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RBF kernel matrix and its gradient sum.

    particles: (n, d). Returns (Kxy (n,n), dxkxy (n,d)) where
    dxkxy[i] = sum_j grad_{x_j} k(x_j, x_i)  — the repulsion term.
    Bandwidth: median trick  h = median(d^2) / log(n+1)  when not given.
    """
    n = particles.shape[0]
    diffs = particles[:, None, :] - particles[None, :, :]       # (n, n, d)
    sq_dists = jnp.sum(diffs**2, axis=-1)                        # (n, n)
    if bandwidth is None:
        # median of pairwise squared distances (incl. zeros on the diagonal,
        # matching the reference's pairwise matrix median)
        med = jnp.median(sq_dists)
        h = med / jnp.log(n + 1.0)
        h = jnp.maximum(h, 1e-12)
    else:
        h = jnp.asarray(bandwidth, particles.dtype)
    kxy = jnp.exp(-sq_dists / (2.0 * h))                         # (n, n)
    # sum_j grad_{x_j} k(x_j, x_i) = (1/h) * [ x_i * sum_j k_ji - sum_j k_ji x_j ]
    sumk = jnp.sum(kxy, axis=0)                                  # (n,)
    dxkxy = (particles * sumk[:, None] - kxy.T @ particles) / h  # (n, d)
    return kxy, dxkxy


def svgd_step(particles: jnp.ndarray, grad_logp: jnp.ndarray,
              stepsize: float, bandwidth: Optional[float] = None) -> jnp.ndarray:
    """One SVGD update given per-particle score gradients (n, d)."""
    n = particles.shape[0]
    kxy, dxkxy = rbf_kernel(particles, bandwidth)
    phi = (kxy @ grad_logp + dxkxy) / n
    return particles + stepsize * phi


def make_svgd_step(grad_logp_fn: Callable, cfg: SVGDConfig = SVGDConfig()) -> Callable:
    """Build a jitted SVGD iteration.

    grad_logp_fn(particles) -> (n, d) score gradients; typically
    ``jax.vmap(jax.grad(logp))`` so all particle solves batch into one
    device program (replacing the reference's serial particle loop,
    UQ network.jl:222-260).
    """

    @jax.jit
    def step(particles):
        grads = grad_logp_fn(particles)
        return svgd_step(particles, grads, cfg.stepsize, cfg.bandwidth)

    return step

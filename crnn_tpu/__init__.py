"""crnn_tpu — a TPU-native JAX framework for Chemical Reaction Neural Networks.

A ground-up rebuild of the capabilities of DENG-MIT/CRNN (Julia research
scripts built on DifferentialEquations.jl) as a single coherent library:

- ``crnn_tpu.ode``        adaptive explicit + implicit ODE solvers (Tsit5,
                          Rosenbrock23, TRBDF2, Kvaerno3) built on
                          ``lax.scan``/``lax.while_loop`` with fixed shapes,
                          batched (vmap-able) per-lane step control, and
                          dense ``saveat`` output.
- ``crnn_tpu.models``     the CRNN right-hand-side family (isothermal,
                          Arrhenius, extended-Arrhenius, reversible,
                          hybrid-MLP) as pure functions.
- ``crnn_tpu.transforms`` the parameter-vector -> physical-weight transforms
                          ("p2vec" variants) and pruning masks.
- ``crnn_tpu.data``       synthetic truth-model generators, noise model,
                          normalisation, LHS sampling, CSV loaders.
- ``crnn_tpu.train``      vmapped multi-experiment losses, optax training
                          loops, Levenberg-Marquardt finisher.
- ``crnn_tpu.uq``         SVGD Bayesian posterior sampling over parameters.
- ``crnn_tpu.infra``      config, checkpointing, metrics, plotting, mesh
                          and sharding utilities.
- ``crnn_tpu.ops``        Pallas TPU kernels for the hot paths.

Design rules (everywhere): pure functions, explicit parameters (no globals),
static shapes, ``jit``/``vmap``/``grad``-compatible control flow only.
"""

__version__ = "0.3.0"

# Numerics guarantee: TPU's default matmul path does bf16 multiplies on
# f32 inputs, which corrupts solver arithmetic (measured ~0.5% on dense
# output, ops/rb23_solve_kernel.py). This is a scientific-computing
# library: force true-f32 matmuls globally. At CRNN sizes (ns<=12) the
# 3-pass cost is unmeasurable.
import os as _os

import jax as _jax

# Opt-out for host applications that manage precision themselves:
# CRNN_TPU_NO_PRECISION_OVERRIDE=1 leaves the global config untouched
# (documented in README.md — this import otherwise mutates process-global
# JAX config).
if not _os.environ.get("CRNN_TPU_NO_PRECISION_OVERRIDE"):
    try:
        _jax.config.update("jax_default_matmul_precision", "highest")
    except Exception:  # pragma: no cover - older jax
        pass

from crnn_tpu.ode import (  # noqa: F401
    ODESolution,
    odesolve,
    Tsit5,
    Rosenbrock23,
    TRBDF2,
    Kvaerno3,
    AutoSwitch,
)

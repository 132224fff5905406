"""Pallas CRNN kernels vs XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from crnn_tpu.ops.crnn_kernels import (
    crnn_rhs_batched,
    crnn_rhs_batched_reference,
    crnn_rhs_jac_batched,
    crnn_rhs_jac_batched_reference,
)


def _setup(b=32, ns=8, nr=8, dtype=jnp.float32):
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    y = jnp.abs(jax.random.normal(k1, (b, ns), dtype)) + 0.05
    w_in = jnp.clip(jax.random.normal(k2, (ns, nr), dtype), 0, 2.5)
    w_b = jax.random.normal(k3, (nr,), dtype) - 1.0
    w_out = jax.random.normal(k4, (ns, nr), dtype)
    return y, w_in, w_b, w_out


def test_rhs_kernel_matches_reference():
    y, w_in, w_b, w_out = _setup()
    ref = crnn_rhs_batched_reference(y, w_in, w_b, w_out, 1e-5, 10.0)
    out = crnn_rhs_batched(y, w_in, w_b, w_out, 1e-5, 10.0, force="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_rhs_jac_kernel_matches_reference():
    y, w_in, w_b, w_out = _setup(b=16, ns=6, nr=4)
    du_ref, j_ref = crnn_rhs_jac_batched_reference(y, w_in, w_b, w_out,
                                                   1e-5, 10.0)
    du, j = crnn_rhs_jac_batched(y, w_in, w_b, w_out, 1e-5, 10.0,
                                 force="interpret")
    np.testing.assert_allclose(np.asarray(du), np.asarray(du_ref),
                               rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(j), np.asarray(j_ref),
                               rtol=2e-6, atol=2e-6)


def test_jac_reference_matches_ad():
    """The analytic batched Jacobian agrees with per-sample jacfwd."""
    y, w_in, w_b, w_out = _setup(b=4, ns=5, nr=3, dtype=jnp.float64)
    lb, ub = 1e-5, 10.0

    def rhs_one(yi):
        logx = jnp.log(jnp.clip(yi, lb, ub))
        return w_out @ jnp.exp(jnp.minimum(w_in.T @ logx + w_b, 60.0))

    _, jac = crnn_rhs_jac_batched_reference(y, w_in, w_b, w_out, lb, ub)
    for i in range(y.shape[0]):
        j_ad = jax.jacfwd(rhs_one)(y[i])
        np.testing.assert_allclose(np.asarray(jac[i]), np.asarray(j_ad),
                                   rtol=1e-10, atol=1e-12)


def test_auto_dispatch_small_batch_uses_xla():
    y, w_in, w_b, w_out = _setup(b=4)
    out = crnn_rhs_batched(y, w_in, w_b, w_out, 1e-5, 10.0)  # auto: XLA path
    ref = crnn_rhs_batched_reference(y, w_in, w_b, w_out, 1e-5, 10.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)

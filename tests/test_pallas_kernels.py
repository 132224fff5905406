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


def _setup_arrhenius(b=16, ns=6, nr=3, dtype=jnp.float32, temp=330.0):
    key = jax.random.PRNGKey(7)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jnp.abs(jax.random.normal(k1, (b, ns), dtype)) + 0.05
    y = jnp.concatenate([x, jnp.full((b, 1), temp, dtype)], axis=1)
    w_in = jnp.abs(jax.random.normal(k2, (ns + 1, nr), dtype))
    w_b = jax.random.normal(k3, (nr,), dtype)
    w_out = jax.random.normal(k4, (ns, nr), dtype)
    return y, w_in, w_b, w_out


def test_arrhenius_rhs_kernel_matches_reference():
    from crnn_tpu.ops.crnn_kernels import (
        arrhenius_rhs_batched, arrhenius_rhs_batched_reference,
    )

    y, w_in, w_b, w_out = _setup_arrhenius()
    ref = arrhenius_rhs_batched_reference(y, w_in, w_b, w_out, 1e-6, 10.0)
    out = arrhenius_rhs_batched(y, w_in, w_b, w_out, 1e-6, 10.0,
                                force="interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-6, atol=2e-6)


def test_arrhenius_jac_kernel_matches_reference_and_ad():
    from crnn_tpu.models.crnn import make_crnn_arrhenius_rhs
    from crnn_tpu.ops.crnn_kernels import (
        arrhenius_rhs_jac_batched, arrhenius_rhs_jac_batched_reference,
    )
    from crnn_tpu.transforms.p2vec import CRNNWeights

    y, w_in, w_b, w_out = _setup_arrhenius(b=8, ns=6, nr=3,
                                           dtype=jnp.float64)
    lb, ub = 1e-6, 10.0
    du_ref, j_ref = arrhenius_rhs_jac_batched_reference(y, w_in, w_b, w_out,
                                                        lb, ub)
    du, j = arrhenius_rhs_jac_batched(y, w_in, w_b, w_out, lb, ub,
                                      force="interpret")
    np.testing.assert_allclose(np.asarray(du), np.asarray(du_ref),
                               rtol=2e-6, atol=2e-6)
    np.testing.assert_allclose(np.asarray(j), np.asarray(j_ref),
                               rtol=2e-6, atol=2e-6)
    # reference Jacobian agrees with forward-mode AD of the per-lane RHS
    rhs = make_crnn_arrhenius_rhs(lb, ub)
    w = CRNNWeights(w_in=w_in, w_b=w_b, w_out=w_out)
    for i in range(3):
        j_ad = jax.jacfwd(lambda yy: rhs(0.0, yy, w))(y[i])
        np.testing.assert_allclose(np.asarray(j_ref[i]), np.asarray(j_ad),
                                   rtol=1e-9, atol=1e-10)


def test_arrhenius_op_gradients_match_reference():
    """custom_vjp ops: gradients equal direct AD of the reference impl."""
    from crnn_tpu.ops.crnn_kernels import (
        arrhenius_rhs_batched_reference, make_arrhenius_ops,
    )

    y, w_in, w_b, w_out = _setup_arrhenius(b=8, dtype=jnp.float64)
    lb, ub = 1e-6, 10.0
    rhs_op, rhs_jac_op = make_arrhenius_ops(lb, ub, force="xla")

    def f_op(w_in_, w_b_, w_out_):
        return jnp.sum(rhs_op(y, w_in_, w_b_, w_out_) ** 2)

    def f_ref(w_in_, w_b_, w_out_):
        return jnp.sum(
            arrhenius_rhs_batched_reference(y, w_in_, w_b_, w_out_,
                                            lb, ub) ** 2)

    g_op = jax.grad(f_op, argnums=(0, 1, 2))(w_in, w_b, w_out)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(w_in, w_b, w_out)
    for a, b_ in zip(g_op, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-10, atol=1e-12)

    def fj_op(w_in_):
        du, jac = rhs_jac_op(y, w_in_, w_b, w_out)
        return jnp.sum(du ** 2) + jnp.sum(jac ** 2)

    g1 = jax.grad(fj_op)(w_in)
    assert np.all(np.isfinite(np.asarray(g1)))


def test_whole_solve_kernel_matches_xla_driver():
    """ops/rb23_solve_kernel.py (interpret mode): the single-launch
    whole-solve kernel + XLA dense-output post-pass reproduces the
    batch-major XLA driver's trajectories and success flags."""
    from crnn_tpu.ode.batch_solve import batch_odesolve_rb23
    from crnn_tpu.ops.crnn_kernels import (
        make_arrhenius_factor_op, make_arrhenius_ops,
    )
    from crnn_tpu.ops.rb23_solve_kernel import make_arrhenius_fused_solve
    from crnn_tpu.transforms.p2vec import init_params_case2, p2vec_case2

    ns, nr, lb, ub = 6, 3, 1e-6, 10.0
    b, n_save, t1 = 6, 15, 40.0
    key = jax.random.PRNGKey(3)
    p = init_params_case2(key, ns, nr, dtype=jnp.float32)
    w = p2vec_case2(p, ns, nr)
    u0 = jnp.concatenate(
        [jnp.abs(jax.random.normal(key, (b, ns), jnp.float32)) * 0.5 + 0.2,
         jnp.full((b, 1), 330.0, jnp.float32)], axis=1)
    u0 = u0.at[:, 2:ns].set(0.0)
    saveat = jnp.linspace(0.0, t1, n_save, dtype=jnp.float32)

    rhs_op, _ = make_arrhenius_ops(lb, ub, force="xla")
    factor_op = make_arrhenius_factor_op(lb, ub)
    sol = batch_odesolve_rb23(
        lambda t, y, w_: rhs_op(y, w_.w_in, w_.w_b, w_.w_out),
        lambda t, y, w_: factor_op(y, w_.w_in, w_.w_b, w_.w_out),
        u0, 0.0, t1, saveat, args=w, rtol=1e-3, atol=1e-6, max_steps=96,
        unroll="while", jac_mode="lowrank")

    solve = make_arrhenius_fused_solve(ns, nr, lb, ub, 0.0, t1, saveat,
                                       1e-3, 1e-6, 96, interpret=True)
    ys, ok = solve(u0, w)
    assert np.asarray(ok).all() and np.asarray(sol.success).all()
    ref = np.asarray(sol.ys)
    rel = np.abs(np.asarray(ys) - ref).max() / (np.abs(ref).max() + 1e-12)
    assert rel < 5e-4, rel

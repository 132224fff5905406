"""Batch-major Rosenbrock driver vs per-lane vmap(odesolve) parity.

The batch-major driver (ode/batch_solve.py) must reproduce the per-lane
driver's trajectories and gradients: same method (Shampine 2(3) W), same
controller, same dense output — only the evaluation layout differs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from crnn_tpu.models.crnn import make_crnn_arrhenius_rhs
from crnn_tpu.models.jacobian import make_crnn_arrhenius_jac
from crnn_tpu.ode import Rosenbrock23, odesolve
from crnn_tpu.ode.batch_solve import batch_odesolve_rb23
from crnn_tpu.ops.crnn_kernels import make_arrhenius_ops
from crnn_tpu.transforms.p2vec import init_params_case2, p2vec_case2

NS, NR = 6, 3
LB, UB = 1e-6, 10.0
T1 = 20.0


def _setup(b=6, dtype=jnp.float64):
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    x = jnp.abs(jax.random.normal(k1, (b, NS), dtype)) * 0.5 + 0.2
    u0 = jnp.concatenate([x, jnp.full((b, 1), 330.0, dtype)], axis=1)
    p = init_params_case2(k2, NS, NR).astype(dtype)
    saveat = jnp.linspace(0.0, T1, 20, dtype=dtype)
    return u0, p, saveat


def _solve_per_lane(p, u0, saveat, unroll="scan"):
    w = p2vec_case2(p, NS, NR)
    rhs = make_crnn_arrhenius_rhs(LB, UB)
    solver = Rosenbrock23(jac=make_crnn_arrhenius_jac(LB, UB))

    def one(u0_i):
        sol = odesolve(rhs, solver, u0_i, 0.0, T1, saveat, args=w,
                       rtol=1e-3, atol=1e-6, max_steps=256, unroll=unroll)
        return sol.ys, sol.success

    return jax.vmap(one)(u0)


def _solve_batch_major(p, u0, saveat, unroll="scan", force="xla"):
    w = p2vec_case2(p, NS, NR)
    rhs_op, rhs_jac_op = make_arrhenius_ops(LB, UB, force=force)
    sol = batch_odesolve_rb23(
        lambda t, y, w_: rhs_op(y, w_.w_in, w_.w_b, w_.w_out),
        lambda t, y, w_: rhs_jac_op(y, w_.w_in, w_.w_b, w_.w_out),
        u0, 0.0, T1, saveat, args=w,
        rtol=1e-3, atol=1e-6, max_steps=256, unroll=unroll,
    )
    return sol.ys, sol.success


def test_trajectory_parity_scan_and_while():
    u0, p, saveat = _setup()
    ys_lane, ok_lane = _solve_per_lane(p, u0, saveat)
    assert np.all(np.asarray(ok_lane))
    for unroll in ("scan", "while"):
        ys_bm, ok_bm = _solve_batch_major(p, u0, saveat, unroll=unroll)
        assert np.all(np.asarray(ok_bm))
        np.testing.assert_allclose(np.asarray(ys_bm), np.asarray(ys_lane),
                                   rtol=1e-8, atol=1e-10)


def test_gradient_parity_vs_per_lane():
    u0, p, saveat = _setup(b=4)

    def loss_lane(p_):
        ys, _ = _solve_per_lane(p_, u0, saveat)
        return jnp.mean(jnp.abs(ys[:, :, :NS]))

    def loss_bm(p_):
        ys, _ = _solve_batch_major(p_, u0, saveat)
        return jnp.mean(jnp.abs(ys[:, :, :NS]))

    g_lane = jax.grad(loss_lane)(p)
    g_bm = jax.grad(loss_bm)(p)
    np.testing.assert_allclose(np.asarray(g_bm), np.asarray(g_lane),
                               rtol=1e-6, atol=1e-9)


def test_interpret_pallas_path_parity():
    """The Pallas kernels (interpret mode on CPU) inside the batch driver
    reproduce the XLA path bit-for-tolerance."""
    u0, p, saveat = _setup(b=4, dtype=jnp.float32)
    ys_xla, ok1 = _solve_batch_major(p, u0, saveat, force="xla")
    ys_pal, ok2 = _solve_batch_major(p, u0, saveat, force="interpret")
    assert np.all(np.asarray(ok1)) and np.all(np.asarray(ok2))
    np.testing.assert_allclose(np.asarray(ys_pal), np.asarray(ys_xla),
                               rtol=5e-5, atol=5e-6)


def test_case2_batch_major_epoch_matches_plain():
    """One batch-mode epoch with the batch-major loss lands on the same
    loss/params as the vmapped per-lane path."""
    from crnn_tpu.cases.case2 import Case2Config, build

    cfg = dict(solver="rosenbrock23", mode="batch", max_steps=96,
               datasize=10, n_exp_train=4, n_exp_test=2)
    s_plain = build(Case2Config(**cfg, batch_major=False))
    s_bm = build(Case2Config(**cfg, batch_major=True, jac_mode="dense",
                             rhs_force="xla"))
    st1 = s_plain.trainer.init(s_plain.init_params)
    st2 = s_bm.trainer.init(s_bm.init_params)
    st1, m1 = s_plain.trainer.epoch_fn()(st1)
    st2, m2 = s_bm.trainer.epoch_fn()(st2)
    np.testing.assert_allclose(float(m2.loss_train), float(m1.loss_train),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st2.params), np.asarray(st1.params),
                               rtol=1e-4, atol=1e-7)


def test_lowrank_woodbury_parity():
    """Low-rank Woodbury W-solve reproduces the dense path exactly:
    J = U @ V is an identity, not an approximation."""
    from crnn_tpu.ops.crnn_kernels import (
        arrhenius_rhs_jac_batched_reference,
        arrhenius_rhs_jac_factors_reference, make_arrhenius_factor_op,
    )

    u0, p, saveat = _setup(b=5)
    w = p2vec_case2(p, NS, NR)
    # factorisation identity: U @ V == dense J
    _, j_dense = arrhenius_rhs_jac_batched_reference(
        u0, w.w_in, w.w_b, w.w_out, LB, UB)
    _, u_fac, v_fac = arrhenius_rhs_jac_factors_reference(
        u0, w.w_in, w.w_b, w.w_out, LB, UB)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("jq,bqk->bjk", u_fac, v_fac)),
        np.asarray(j_dense), rtol=1e-12, atol=1e-14)

    # full solve parity (trajectories + gradients)
    factor_op = make_arrhenius_factor_op(LB, UB)
    rhs_op, _ = make_arrhenius_ops(LB, UB, force="xla")

    def solve_lr(p_):
        w_ = p2vec_case2(p_, NS, NR)
        sol = batch_odesolve_rb23(
            lambda t, y, ww: rhs_op(y, ww.w_in, ww.w_b, ww.w_out),
            lambda t, y, ww: factor_op(y, ww.w_in, ww.w_b, ww.w_out),
            u0, 0.0, T1, saveat, args=w_, rtol=1e-3, atol=1e-6,
            max_steps=256, unroll="scan", jac_mode="lowrank")
        return sol.ys, sol.success

    ys_lr, ok = solve_lr(p)
    ys_dense, _ = _solve_batch_major(p, u0, saveat)
    assert np.all(np.asarray(ok))
    np.testing.assert_allclose(np.asarray(ys_lr), np.asarray(ys_dense),
                               rtol=1e-7, atol=1e-9)

    g_lr = jax.grad(lambda p_: jnp.mean(jnp.abs(solve_lr(p_)[0][:, :, :NS])))(p)
    g_dense = jax.grad(
        lambda p_: jnp.mean(jnp.abs(_solve_batch_major(p_, u0, saveat)[0][:, :, :NS])))(p)
    np.testing.assert_allclose(np.asarray(g_lr), np.asarray(g_dense),
                               rtol=1e-5, atol=1e-8)


# --------------------------------------------------------------------------
# Non-autonomous (cathode T(t)-ramp) batch-major path — round 5
# --------------------------------------------------------------------------

def _cathode_setup(b=5, dtype=jnp.float64):
    from crnn_tpu.transforms.p2vec import init_params_cathode, p2vec_cathode

    key = jax.random.PRNGKey(7)
    ps = (init_params_cathode(key, dtype=dtype)[None, :]
          + 0.02 * jax.random.normal(key, (b, 18), dtype))
    w_b = jax.vmap(p2vec_cathode)(ps)
    u0 = jnp.zeros((b, 3), dtype).at[:, 0].set(1.0)
    t1 = 1500.0
    saveat = jnp.linspace(0.0, t1, 24, dtype=dtype)
    return ps, w_b, u0, t1, saveat


def test_cathode_analytic_jac_ft_vs_ad():
    """Closed-form Jacobian and df/dt of the batched cathode RHS match
    forward-mode AD on the same clipped RHS."""
    from crnn_tpu.models.crnn import make_cathode_rhs, make_cathode_rhs_batch
    from crnn_tpu.transforms.p2vec import p2vec_cathode

    ps, w_b, u0, _, _ = _cathode_setup()
    f, f_jac = make_cathode_rhs_batch(1e-8)
    rhs_lane = make_cathode_rhs(1e-8)
    beta = 10.0
    t = jnp.linspace(100.0, 900.0, ps.shape[0])
    y = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), u0.shape)) * 0.4 + 0.05

    du, jac, ft = f_jac(t, y, (w_b, beta))
    np.testing.assert_allclose(np.asarray(f(t, y, (w_b, beta))),
                               np.asarray(du), rtol=1e-12)

    for i in range(ps.shape[0]):
        w_i = p2vec_cathode(ps[i])
        du_ad = rhs_lane(t[i], y[i], (w_i, beta))
        jac_ad = jax.jacfwd(lambda yy: rhs_lane(t[i], yy, (w_i, beta)))(y[i])
        ft_ad = jax.jvp(lambda tt: rhs_lane(tt, y[i], (w_i, beta)),
                        (t[i],), (jnp.ones((), y.dtype),))[1]
        np.testing.assert_allclose(np.asarray(du[i]), np.asarray(du_ad),
                                   rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(np.asarray(jac[i]), np.asarray(jac_ad),
                                   rtol=1e-9, atol=1e-11)
        np.testing.assert_allclose(np.asarray(ft[i]), np.asarray(ft_ad),
                                   rtol=1e-9, atol=1e-11)


def test_cathode_nonautonomous_parity_and_grad():
    """Batch-major nonautonomous=True reproduces per-lane Rosenbrock23
    (which carries the Shampine dt*d*ft term) on the heating-ramp cathode:
    trajectories and parameter gradients."""
    from crnn_tpu.models.crnn import make_cathode_rhs, make_cathode_rhs_batch
    from crnn_tpu.transforms.p2vec import p2vec_cathode

    ps, _, u0, t1, saveat = _cathode_setup()
    beta = 10.0
    rhs_lane = make_cathode_rhs(1e-8)
    f, f_jac = make_cathode_rhs_batch(1e-8)

    def solve_lane(ps_):
        def one(p_i, u0_i):
            w = p2vec_cathode(p_i)
            sol = odesolve(rhs_lane, Rosenbrock23(), u0_i, 0.0, t1, saveat,
                           args=(w, beta), rtol=1e-4, atol=1e-8,
                           max_steps=512, unroll="scan")
            return sol.ys, sol.success
        return jax.vmap(one)(ps_, u0)

    def solve_bm(ps_):
        from crnn_tpu.transforms.p2vec import p2vec_cathode as p2v
        w_b = jax.vmap(p2v)(ps_)
        sol = batch_odesolve_rb23(
            f, f_jac, u0, 0.0, t1, saveat, args=(w_b, beta),
            rtol=1e-4, atol=1e-8, max_steps=512, unroll="scan",
            nonautonomous=True)
        return sol.ys, sol.success

    ys_lane, ok_lane = solve_lane(ps)
    ys_bm, ok_bm = solve_bm(ps)
    assert np.all(np.asarray(ok_lane)) and np.all(np.asarray(ok_bm))
    np.testing.assert_allclose(np.asarray(ys_bm), np.asarray(ys_lane),
                               rtol=1e-7, atol=1e-9)

    g_lane = jax.grad(lambda q: jnp.mean(jnp.abs(solve_lane(q)[0])))(ps)
    g_bm = jax.grad(lambda q: jnp.mean(jnp.abs(solve_bm(q)[0])))(ps)
    np.testing.assert_allclose(np.asarray(g_bm), np.asarray(g_lane),
                               rtol=1e-5, atol=1e-9)


def test_cathode_omitting_ft_diverges_from_reference_path():
    """Sanity that the ft term matters on the ramp: solving the same problem
    autonomously (ft dropped) must NOT match per-lane Rosenbrock23 to the
    parity tolerance — guards against the term silently becoming a no-op."""
    from crnn_tpu.models.crnn import make_cathode_rhs_batch
    from crnn_tpu.transforms.p2vec import p2vec_cathode

    ps, _, u0, t1, saveat = _cathode_setup()
    beta = 10.0
    f, f_jac = make_cathode_rhs_batch(1e-8)
    w_b = jax.vmap(p2vec_cathode)(ps)

    def run(nonauto):
        fj = f_jac if nonauto else (lambda t, y, a: f_jac(t, y, a)[:2])
        sol = batch_odesolve_rb23(
            f, fj, u0, 0.0, t1, saveat, args=(w_b, beta),
            rtol=1e-4, atol=1e-8, max_steps=512, unroll="scan",
            nonautonomous=nonauto)
        return np.asarray(sol.ys)

    diff = np.max(np.abs(run(True) - run(False)))
    assert diff > 1e-9, f"ft term had no effect (max diff {diff})"


def test_compensated_driver_matches_plain_at_f64():
    """ode/compensated.py: at f64 the (hi, lo) pair's lo stays ~0, so the
    compensated driver must reproduce the plain batch driver; two_sum is
    error-free; gradients flow through the compensated update."""
    from crnn_tpu.models.crnn import make_crnn_scaled_rhs
    from crnn_tpu.models.jacobian import make_crnn_scaled_jac
    from crnn_tpu.ode.compensated import batch_odesolve_rb23_comp, two_sum
    from crnn_tpu.transforms.p2vec import (init_params_robertson,
                                           p2vec_robertson)

    a, b = jnp.float32(1.0), jnp.float32(1e-8)
    s, e = two_sum(a, b)
    assert float(s) + float(e) == float(np.float64(1.0) + np.float64(1e-8))

    ds = jnp.ones((3,), jnp.float64)
    rhs = make_crnn_scaled_rhs(1e-8, jnp.inf, ds)
    jac_fn = make_crnn_scaled_jac(1e-8, jnp.inf, ds)
    p = init_params_robertson(jax.random.PRNGKey(0), 3, 6)
    w = p2vec_robertson(p, 3, 6)
    f_b = lambda t, y, w_: jax.vmap(lambda ti, yi: rhs(ti, yi, w_))(t, y)
    fj_b = lambda t, y, w_: jax.vmap(
        lambda ti, yi: (rhs(ti, yi, w_), jac_fn(ti, yi, w_)))(t, y)
    u0 = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (4, 3),
                                   jnp.float64)) * 0.5 + 0.3
    saveat = 10.0 ** jnp.linspace(0.0, 2.0, 12)
    s1 = batch_odesolve_rb23(f_b, fj_b, u0, 0.0, 100.0, saveat, args=w,
                             rtol=1e-3, atol=1e-6, max_steps=128,
                             unroll="scan")
    s2 = batch_odesolve_rb23_comp(f_b, fj_b, u0, 0.0, 100.0, saveat, args=w,
                                  rtol=1e-3, atol=1e-6, max_steps=128)
    assert np.all(np.asarray(s1.success)) and np.all(np.asarray(s2.success))
    np.testing.assert_allclose(np.asarray(s2.ys), np.asarray(s1.ys),
                               rtol=1e-10, atol=1e-12)

    g = jax.grad(lambda q: jnp.mean(jnp.abs(batch_odesolve_rb23_comp(
        f_b, fj_b, u0, 0.0, 100.0, saveat, args=p2vec_robertson(q, 3, 6),
        rtol=1e-3, atol=1e-6, max_steps=128).ys)))(p)
    assert bool(jnp.isfinite(g).all())

"""Data-parallel framework integration: run_case(dp=N) and sharded SVGD.

Round-2 verdict: the DP layer was reachable only from tests/dryrun — these
tests pin the USER-FACING routes: a case trained via ``run_case(..., dp)``
must match the single-device batch trainer, and the sharded SVGD step
(parallel/svgd_dp.py) must reproduce the local vmapped SVGD iteration.
Runs on the virtual 8-device CPU mesh (conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_run_case_dp_matches_batch_trainer(tmp_path):
    """One dp=2 epoch == one single-device batch epoch (same update set,
    same optimizer): parameters and eval losses must agree."""
    from crnn_tpu.cases.base import run_case
    from crnn_tpu.cases.case2 import Case2Config, build

    cfg = dict(n_exp_train=4, n_exp_test=2, datasize=10, max_steps=96,
               solver="rosenbrock23", batch_major=False)
    s_ref = build(Case2Config(**cfg))
    st = s_ref.trainer.init(s_ref.init_params)
    st, m = s_ref.trainer.epoch_fn()(st)

    s_dp = build(Case2Config(**cfg))
    state, history = run_case(s_dp, n_epoch=1, out_dir=str(tmp_path),
                              dp=2, log_every=0, n_plot=10)
    np.testing.assert_allclose(history["loss_train"][-1],
                               float(m.loss_train), rtol=1e-5)
    np.testing.assert_allclose(history["loss_val"][-1],
                               float(m.loss_val), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(st.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_run_case_dp_padding(tmp_path):
    """n_exp_train=5 on a 4-device mesh: padded lane must not change the
    loss (weight-0 padding)."""
    from crnn_tpu.cases.base import run_case
    from crnn_tpu.cases.case1 import Case1Config, build

    cfg = dict(n_exp_train=5, n_exp_test=2, datasize=12, max_steps=96)
    s_ref = build(Case1Config(**cfg))
    st = s_ref.trainer.init(s_ref.init_params)
    st, m = s_ref.trainer.epoch_fn()(st)

    s_dp = build(Case1Config(**cfg))
    _, history = run_case(s_dp, n_epoch=1, out_dir=str(tmp_path),
                          dp=4, log_every=0, n_plot=10)
    np.testing.assert_allclose(history["loss_train"][-1],
                               float(m.loss_train), rtol=1e-5)


def test_run_case_dp_padding_arrhenius_grads_finite(tmp_path):
    """Non-divisible experiment count on a case with singular features at
    u0=0 (case2: 1/(R*T) is inf at T=0): padded lanes must repeat real
    data, or reverse-mode AD turns the zero lane-cotangent into 0*inf=NaN
    and the psum poisons every device's gradient."""
    from crnn_tpu.cases.base import run_case
    from crnn_tpu.cases.case2 import Case2Config, build

    s = build(Case2Config(n_exp_train=5, n_exp_test=2, datasize=10,
                          max_steps=64))
    _, history = run_case(s, n_epoch=2, out_dir=str(tmp_path),
                          dp=4, log_every=0, n_plot=10)
    assert np.isfinite(history["loss_train"]).all()
    assert np.isfinite(history["grad_norm"]).all()


def test_run_case_dp_rejects_sequential_mode(tmp_path):
    from crnn_tpu.cases.base import run_case
    from crnn_tpu.cases.case1 import Case1Config, build

    setup = build(Case1Config(n_exp_train=2, n_exp_test=1, datasize=8,
                              mode="sequential"))
    with pytest.raises(ValueError, match="sequential"):
        run_case(setup, n_epoch=1, out_dir=str(tmp_path), dp=2)


def test_run_case_dp_requires_loss_on_data(tmp_path):
    from crnn_tpu.cases.base import CaseSetup, run_case
    from crnn_tpu.cases.case1 import Case1Config, build

    setup = build(Case1Config(n_exp_train=2, n_exp_test=1, datasize=8))
    setup.loss_on_data = None
    with pytest.raises(ValueError, match="loss_on_data"):
        run_case(setup, n_epoch=1, out_dir=str(tmp_path), dp=2)


def test_svgd_dp_matches_local_iteration():
    """cathode_uq with dp=4: one sharded SVGD iteration reproduces the
    local vmapped iteration on identical particles."""
    from crnn_tpu.cases.cathode_uq import CathodeUQConfig, build_uq

    base = dict(num_particles=8, maxiters=96, rtol=1e-3, n_iters=1)
    cfg_local = CathodeUQConfig(**base)
    cfg_dp = CathodeUQConfig(**base, dp=4)

    p_local, step_local, ex = build_uq(cfg_local)
    p_dp, step_dp, ex_dp = build_uq(cfg_dp)
    np.testing.assert_allclose(np.asarray(p_local), np.asarray(p_dp))
    assert ex_dp["mesh"] is not None

    i_exp = jnp.asarray(0)
    new_local, loss_local = step_local(p_local, i_exp, 1e-4)
    new_dp, loss_dp = step_dp(p_dp, i_exp, 1e-4)
    np.testing.assert_allclose(float(loss_dp), float(loss_local),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(new_dp), np.asarray(new_local),
                               rtol=1e-8, atol=1e-12)


def test_svgd_dp_rejects_indivisible_particles():
    from crnn_tpu.cases.cathode_uq import CathodeUQConfig, build_uq

    with pytest.raises(ValueError, match="divide"):
        build_uq(CathodeUQConfig(num_particles=10, dp=4, maxiters=64))


def test_run_case_dp_restart_preserves_best(tmp_path):
    """dp restart carry: a worse continuation segment (huge lr) must not
    overwrite the previous segment's best p_opt (mirrors the single-device
    test in test_guard.py)."""
    from crnn_tpu.cases.base import run_case
    from crnn_tpu.cases.case1 import Case1Config, build

    cfg = dict(n_exp_train=4, n_exp_test=2, datasize=8, max_steps=64)
    _, h1 = run_case(build(Case1Config(lr=1e-3, **cfg)), n_epoch=3,
                     out_dir=str(tmp_path), dp=2, log_every=0, n_plot=10)
    p1 = np.load(tmp_path / "case1" / "p_opt.npy").copy()

    _, h2 = run_case(build(Case1Config(lr=50.0, **cfg)), n_epoch=3,
                     out_dir=str(tmp_path), dp=2, log_every=0, n_plot=10,
                     restart=True)
    assert h2["best_val"] <= h1["best_val"] + 1e-12
    if h2["best_val"] == pytest.approx(h1["best_val"]):
        np.testing.assert_allclose(
            np.load(tmp_path / "case1" / "p_opt.npy"), p1)

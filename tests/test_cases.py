"""End-to-end case smoke + learning tests (SURVEY.md §4 strategy (3)).

Tiny-budget versions of the case pipelines: data generation succeeds,
epochs run under jit, loss decreases, variants (pruning, missing species,
horizons) execute. Full mechanism-recovery runs live on TPU via scripts/.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _run_epochs(setup, n):
    state = setup.trainer.init(setup.init_params)
    step = setup.trainer.epoch_fn()
    first = None
    for _ in range(n):
        state, m = step(state)
        if first is None:
            first = float(m.loss_train)
    return state, first, float(m.loss_train), m


def test_case1_learns():
    from crnn_tpu.cases.case1 import Case1Config, build

    setup = build(Case1Config(n_exp_train=6, n_exp_test=2, datasize=30,
                              lr=5e-3, max_steps=128))
    assert bool(setup.dataset.success.all())
    state, first, last, m = _run_epochs(setup, 25)
    assert np.isfinite(last)
    assert last < first  # learning signal flows through the solver


def test_case1_sequential_mode():
    from crnn_tpu.cases.case1 import Case1Config, build

    setup = build(Case1Config(n_exp_train=4, n_exp_test=2, datasize=20,
                              mode="sequential", max_steps=128))
    state, first, last, m = _run_epochs(setup, 3)
    assert np.isfinite(last)


def test_case1_pruning_variant():
    from crnn_tpu.cases.case1 import Case1Config, build

    setup = build(Case1Config(n_exp_train=4, n_exp_test=2, datasize=20,
                              p_cutoff=0.05, max_steps=128))
    w = setup.weights_fn(setup.init_params)
    # init params are N(0, 0.1): the cutoff must zero some w_out entries
    assert np.asarray(jnp.sum(w.w_out == 0.0)) > 0
    _, first, last, _ = _run_epochs(setup, 2)
    assert np.isfinite(last)


def test_case2_missing_and_loss_masking():
    from crnn_tpu.cases.case2 import Case2Config, build

    cfg = Case2Config(n_exp_train=4, n_exp_test=2, datasize=16,
                      i_obs=(0, 1, 3, 4, 5), missing_u0=True,
                      solver="rosenbrock23", max_steps=128)
    setup = build(cfg)
    assert bool(setup.dataset.success.all())
    _, first, last, _ = _run_epochs(setup, 8)
    assert np.isfinite(last) and last < first


def test_case3_log_loss_and_all_exp_updates():
    from crnn_tpu.cases.case3 import Case3Config, build

    setup = build(Case3Config(n_exp_train=5, n_exp_test=2, datasize=20,
                              max_steps=128))
    assert setup.trainer.n_exp_update == 7  # case3 trains on all experiments
    _, first, last, _ = _run_epochs(setup, 8)
    assert np.isfinite(last) and last < first


def test_grn_frozen_rows():
    from crnn_tpu.cases.case3 import build, grn_config

    cfg = grn_config()
    cfg.n_exp_train, cfg.n_exp_test, cfg.datasize = 4, 2, 12
    cfg.max_steps = 128
    setup = build(cfg)
    w = setup.weights_fn(setup.init_params)
    np.testing.assert_array_equal(np.asarray(w.w_out)[[0, 3, 6], :], 0.0)
    _, _, last, _ = _run_epochs(setup, 2)
    assert np.isfinite(last)


def test_robertson_stochastic_horizon_and_clip():
    from crnn_tpu.cases.robertson import RobertsonConfig, build

    setup = build(RobertsonConfig(n_exp_train=4, n_exp_val=2, max_steps=640))
    assert bool(setup.dataset.success.all())
    _, first, last, m = _run_epochs(setup, 4)
    assert np.isfinite(last)
    # gradient norm must respect the clip at grad_max=10 (post-clip update)
    assert np.isfinite(float(m.grad_norm))


def test_robertson_float32_training_path():
    """The f32 training experiment (RobertsonConfig.dtype): truth data is
    generated in f64 and cast; training state stays f32; the first epochs'
    losses track the f64 path closely at identical params."""
    from crnn_tpu.cases.robertson import RobertsonConfig, build

    s32 = build(RobertsonConfig(n_exp_train=4, n_exp_val=1, datasize=16,
                                max_steps=256, dtype="float32"))
    s64 = build(RobertsonConfig(n_exp_train=4, n_exp_val=1, datasize=16,
                                max_steps=256, dtype="float64"))
    assert s32.init_params.dtype == jnp.float32
    assert s32.dataset.ys.dtype == jnp.float32
    # identical data up to cast (same seed, f64 generation)
    np.testing.assert_allclose(np.asarray(s32.dataset.ys),
                               np.asarray(s64.dataset.ys, np.float32),
                               rtol=1e-6)
    mask32 = jnp.ones((16,), jnp.float32)
    mask64 = jnp.ones((16,), jnp.float64)
    p64 = s64.init_params
    l32 = float(s32.extras["loss_i_exp"](p64.astype(jnp.float32), 0, mask32))
    l64 = float(s64.extras["loss_i_exp"](p64, 0, mask64))
    assert abs(l32 - l64) / abs(l64) < 1e-3
    _, _, last, _ = _run_epochs(s32, 3)
    assert np.isfinite(last)


def test_lm_finisher_quadratic():
    """LM solves a small nonlinear least-squares exactly."""
    from crnn_tpu.train.lm import levenberg_marquardt

    target = jnp.array([1.0, -2.0, 0.5])

    def resid(p):
        return jnp.concatenate([p - target, jnp.atleast_1d(p[0] * p[1] - (-2.0))])

    p0 = jnp.zeros(3)
    p_opt, info = levenberg_marquardt(resid, p0, max_iters=100)
    np.testing.assert_allclose(np.asarray(p_opt), np.asarray(target),
                               atol=1e-6)
    assert info["converged"]


def test_checkpoint_roundtrip(tmp_path):
    from crnn_tpu.cases.case1 import Case1Config, build
    from crnn_tpu.infra.checkpoint import load_checkpoint, save_checkpoint

    setup = build(Case1Config(n_exp_train=3, n_exp_test=1, datasize=10,
                              max_steps=64))
    state = setup.trainer.init(setup.init_params)
    step = setup.trainer.epoch_fn()
    state, _ = step(state)
    path = str(tmp_path / "ck.msgpack")
    save_checkpoint(path, state)
    restored = load_checkpoint(path, setup.trainer.init(setup.init_params))
    np.testing.assert_array_equal(np.asarray(restored.params),
                                  np.asarray(state.params))
    assert int(restored.epoch) == int(state.epoch)
    # training continues bit-exactly from the restored state
    s1, m1 = step(state)
    s2, m2 = step(restored)
    np.testing.assert_allclose(float(m1.loss_train), float(m2.loss_train),
                               rtol=1e-12)


def test_fwd_grad_mode_matches_rev():
    """jacfwd-through-while updates == reverse-through-scan updates."""
    import dataclasses

    from crnn_tpu.cases.case1 import Case1Config, build

    cfg = Case1Config(n_exp_train=3, n_exp_test=1, datasize=10, max_steps=96)
    s_rev = build(cfg)
    s_fwd = build(cfg)
    s_fwd.trainer.grad_mode = "fwd"
    st_r = s_rev.trainer.init(s_rev.init_params)
    st_f = s_fwd.trainer.init(s_fwd.init_params)
    st_r, m_r = s_rev.trainer.epoch_fn()(st_r)
    st_f, m_f = s_fwd.trainer.epoch_fn()(st_f)
    np.testing.assert_allclose(np.asarray(st_f.params), np.asarray(st_r.params),
                               rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(float(m_f.loss_train), float(m_r.loss_train),
                               rtol=1e-5)


def test_case1_rev_smoke():
    from crnn_tpu.cases.case1_rev import Case1RevConfig, build

    setup = build(Case1RevConfig(n_exp_train=3, n_exp_test=1, datasize=12,
                                 max_steps=256))
    assert setup.trainer.grad_mode == "fwd"
    _, first, last, _ = _run_epochs(setup, 2)
    assert np.isfinite(last)


def test_hychem_real_file_loader(tmp_path):
    """load_trajectory consumes the Cantera data protocol exactly as
    gen_data_pyrolysis.py writes it (np.savetxt of [t, T, P, Y1..Y9],
    HyChem/gen_data_pyrolysis.py:36-39) and the case trains from it."""
    import numpy as np

    from crnn_tpu.cases.hychem import HyChemConfig, build, synthetic_pyrolysis

    raw = synthetic_pyrolysis()
    path = tmp_path / "data_1"
    np.savetxt(path, raw)          # the reference's exact writer call

    setup = build(HyChemConfig(data_path=str(path), nr=2, ntotal=16,
                               max_steps=96))
    st = setup.trainer.init(setup.init_params)
    st, m = setup.trainer.epoch_fn()(st)
    assert np.isfinite(float(m.loss_train))

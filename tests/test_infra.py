"""Infra tests: YAML config flow, DSC loaders, metrics, UQ case wiring."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np


def test_yaml_config_roundtrip(tmp_path):
    from crnn_tpu.cases.cathode import CathodeConfig
    from crnn_tpu.infra.config import (
        config_from_yaml, snapshot_config, writeback_results, load_yaml,
    )

    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        f.write("expr_name: test-run\nns: 3\nnr: 3\nadam_lr: 0.002\n")
    cfg = config_from_yaml(CathodeConfig, cfg_path)
    assert cfg.expr_name == "test-run"
    assert cfg.adam_lr == 0.002
    assert cfg.ns == 3

    results = str(tmp_path / "results")
    snap = snapshot_config(cfg_path, results)
    assert os.path.exists(snap)
    writeback_results(snap, {"loss_train": 0.123, "loss_val": 0.456})
    data = load_yaml(snap)
    assert data["loss_train"] == 0.123
    assert data["expr_name"] == "test-run"


def test_yaml_config_unknown_key_errors(tmp_path):
    import pytest

    from crnn_tpu.cases.cathode import CathodeConfig
    from crnn_tpu.infra.config import config_from_yaml

    cfg_path = str(tmp_path / "bad.yaml")
    with open(cfg_path, "w") as f:
        f.write("not_a_field: 1\n")
    with pytest.raises(ValueError, match="unknown config keys"):
        config_from_yaml(CathodeConfig, cfg_path)


def test_dsc_loader_roundtrip(tmp_path):
    from crnn_tpu.data.loaders import load_cathode_csv, pack_curves, synthetic_dsc

    # write a curve with a duplicated temperature row (must dedup)
    path = str(tmp_path / "cath_1_10.csv")
    rows = np.array([[110.0, 0.01], [120.0, 0.02], [120.0, 0.03], [130.0, 0.05]])
    np.savetxt(path, rows, delimiter=",")
    curve = load_cathode_csv(path, beta=10.0)
    assert curve.shape == (3, 2)  # dedup dropped one row
    np.testing.assert_allclose(curve[0, 0], (110.0 - 100.0) * 60.0 / 10.0)

    packed = pack_curves([curve, curve[:2]], [10.0, 20.0])
    assert packed.ts.shape == (2, 3)
    assert packed.mask[1, 2] == 0.0  # padded lane masked out
    assert packed.ts[1, 2] == packed.ts[1, 1]  # padded with t_end

    dsc = synthetic_dsc(seed=0)
    assert dsc.ts.shape[0] == 5
    assert np.all(dsc.n_points > 10)
    assert np.all(np.isfinite(dsc.hrr))


def test_uncert_replicate_loader(tmp_path):
    """UNCERT format (UQ dataset.jl:5-24): [T_C, hrr_1..hrr_R] per row;
    dedup temperatures, t = (T-100)*60/beta, pad ragged curves + masks."""
    from crnn_tpu.data.loaders import load_uncert_dir

    rng = np.random.default_rng(0)
    lens = {2: 5, 5: 7, 10: 6, 15: 8, 20: 4}
    for beta, n in lens.items():
        temps = np.linspace(110.0, 300.0, n)
        temps = np.concatenate([temps, temps[-1:]])  # duplicate last temp
        reps = np.abs(rng.standard_normal((n + 1, 3)))
        np.savetxt(str(tmp_path / f"UNCERT_cath_1_{beta}.csv"),
                   np.concatenate([temps[:, None], reps], axis=1),
                   delimiter=",")
    data = load_uncert_dir(str(tmp_path))
    assert data.ts.shape == (5, 8)
    assert data.reps.shape == (5, 8, 3)
    np.testing.assert_array_equal(data.n_points, [5, 7, 6, 8, 4])
    # dedup dropped the duplicated temperature row
    assert data.mask[0].sum() == 5
    # time conversion for the first curve (beta=2)
    np.testing.assert_allclose(data.ts[0, 0], (110.0 - 100.0) * 60.0 / 2.0)
    # padding: times hold t_end, replicates zero, mask zero
    assert data.ts[4, 5] == data.ts[4, 3]
    assert np.all(data.reps[4, 4:] == 0.0)


def test_metrics_logger(tmp_path):
    from crnn_tpu.infra.metrics import MetricsLogger

    path = str(tmp_path / "m.jsonl")
    lg = MetricsLogger(path)
    lg.log(epoch=1, loss_train=0.5)
    lg.log(epoch=2, loss_train=0.25)
    lg.close()
    lines = [json.loads(line) for line in open(path)]
    assert len(lines) == 2
    assert lines[1]["loss_train"] == 0.25


def test_cathode_uq_iteration():
    from crnn_tpu.cases.cathode_uq import CathodeUQConfig, build_uq

    cfg = CathodeUQConfig(num_particles=6, n_replicates=5, maxiters=384)
    particles, it_fn, ex = build_uq(cfg)
    assert particles.shape == (6, 17)
    p2, loss = it_fn(particles, jnp.asarray(0), 2e-4)
    assert np.isfinite(float(loss))
    assert float(jnp.mean(jnp.abs(p2 - particles))) > 0  # particles moved


def test_cathode_uq_midrun_checkpoint(tmp_path):
    """run_uq snapshots particles+losses mid-run so a killed
    reference-scale run (25k iters) is resumable/salvageable."""
    from crnn_tpu.cases.cathode_uq import CathodeUQConfig, run_uq

    cfg = CathodeUQConfig(n_iters=3, num_particles=4, n_replicates=3,
                          maxiters=256, solver="rosenbrock23")
    run_uq(cfg, verbose=False, checkpoint_dir=str(tmp_path),
           checkpoint_every=2)
    ck = np.load(tmp_path / "particles_ckpt.npy")
    assert ck.shape == (4, 17)
    losses = np.load(tmp_path / "losses_ckpt.npz")
    assert int(losses["it"]) == 2 and len(losses["loss_train"]) == 2


def test_cathode_uq_resume_from_checkpoint(tmp_path):
    """--resume restarts from the periodic snapshot: the resumed run
    starts at the saved iteration with the saved particles and a
    decay-adjusted stepsize, and extends (not overwrites) the loss
    history. Both loop paths (unfused and chunked) honour it."""
    from crnn_tpu.cases.cathode_uq import CathodeUQConfig, run_uq

    cfg = CathodeUQConfig(n_iters=2, num_particles=4, n_replicates=3,
                          maxiters=256, solver="rosenbrock23",
                          stepsize_decay_epochs=2)
    run_uq(cfg, verbose=False, checkpoint_dir=str(tmp_path),
           checkpoint_every=2)
    ck = np.load(tmp_path / "particles_ckpt.npy")

    cfg4 = CathodeUQConfig(n_iters=4, num_particles=4, n_replicates=3,
                           maxiters=256, solver="rosenbrock23",
                           stepsize_decay_epochs=2)
    p_res, info = run_uq(cfg4, verbose=False, checkpoint_dir=str(tmp_path),
                         checkpoint_every=10, resume=True, chunk=2)
    # history carried over: 2 saved + 2 new iterations
    assert len(info["loss_train"]) == 4
    # and the resumed run really moved on from the snapshot particles
    assert float(np.mean(np.abs(np.asarray(p_res) - ck))) > 0


def test_cathode_uq_chunked_matches_unfused():
    """--chunk N (N iterations fused into one dispatch) must be
    bit-identical to the per-iteration loop: same permutation stream,
    stepsize schedule, loss curves, and final particles."""
    from crnn_tpu.cases.cathode_uq import CathodeUQConfig, run_uq

    cfg = CathodeUQConfig(n_iters=5, num_particles=4, n_replicates=3,
                          maxiters=96, rtol=1e-3, solver="rosenbrock23",
                          stepsize_decay_epochs=2)
    p1, i1 = run_uq(cfg, verbose=False)
    p2, i2 = run_uq(cfg, verbose=False, chunk=2)   # 2+2+1 incl. remainder
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-12)
    np.testing.assert_allclose(i1["loss_train"], i2["loss_train"],
                               rtol=1e-12)
    np.testing.assert_allclose(i1["loss_val"], i2["loss_val"], rtol=1e-12)


def test_posterior_analysis():
    from crnn_tpu.uq.posterior import (
        ParticleHistory, kendall_correlation, posterior_moments,
    )

    rng = np.random.default_rng(0)
    z = rng.standard_normal((100, 1))
    particles = np.hstack([z, 2 * z + 0.1 * rng.standard_normal((100, 1)),
                           rng.standard_normal((100, 1))])
    corr = kendall_correlation(particles)
    assert corr[0, 1] > 0.8          # strongly correlated pair
    assert abs(corr[0, 2]) < 0.25    # independent pair
    m = posterior_moments(particles)
    assert abs(m["mean"][0]) < 0.5

    h = ParticleHistory(gap=5)
    for it in range(10):
        h.maybe_record(it, particles)
    assert h.tensor().shape == (2, 100, 3)


def test_dp_eval_on_virtual_mesh():
    """shard_map eval over the 8-device CPU mesh matches local vmap."""
    from crnn_tpu.parallel.dp import make_dp_eval
    from crnn_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)

    def loss_on_data(p, u0, ys, mask):
        return jnp.sum((p * u0 - ys) ** 2 * mask)

    eval_fn = make_dp_eval(loss_on_data, mesh)
    p = jnp.asarray(2.0)
    u0 = jnp.arange(16.0)
    ys = jnp.ones(16)
    mask = jnp.ones(16)
    got = eval_fn(p, u0, ys, mask)
    want = jax.vmap(lambda a, b, c: loss_on_data(p, a, b, c))(u0, ys, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_x64_scope_restores_flag():
    """x64_scope must snapshot/restore jax_enable_x64 (BENCH_r04 leak).

    The f64 case builds flip the global flag; a borrower wrapping them in
    x64_scope must come back to its own regime even if the body raises.
    """
    import jax

    from crnn_tpu.infra.runtime import x64_scope

    prev = bool(jax.config.jax_enable_x64)
    try:
        jax.config.update("jax_enable_x64", False)
        with x64_scope():
            assert bool(jax.config.jax_enable_x64) is True
            assert jax.numpy.linspace(0.0, 1.0, 3).dtype == jax.numpy.float64
        assert bool(jax.config.jax_enable_x64) is False
        assert jax.numpy.linspace(0.0, 1.0, 3).dtype == jax.numpy.float32

        # restore-on-raise
        try:
            with x64_scope():
                raise RuntimeError("boom")
        except RuntimeError:
            pass
        assert bool(jax.config.jax_enable_x64) is False
    finally:
        jax.config.update("jax_enable_x64", prev)

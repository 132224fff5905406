"""loss_on_data (the dp sharding hook) must agree with loss_i_exp.

Every case exposes two loss entry points: the index-based loss_i_exp the
single-device Trainer uses, and the index-free loss_on_data the
data-parallel runner shards. If they drift apart, --dp silently trains a
different objective — this pins the invariant for the cases whose hooks
were added in round 4 (yeast, case1_rev, robertson_qssa, hychem,
cathode); case1/2/3/robertson are covered by tests/test_dp_runner.py
parity tests.
"""

import jax.numpy as jnp
import numpy as np
import pytest


def _check(setup, n_save, i_exp=0, rtol=1e-6):
    ds = setup.dataset
    mask = jnp.ones((n_save,), jnp.result_type(ds.ys.dtype))
    p = setup.init_params
    a = float(setup.trainer.loss_i_exp(p, jnp.asarray(i_exp), mask))
    b = float(setup.loss_on_data(p, ds.u0[i_exp], ds.ys[i_exp], mask))
    assert np.isfinite(a)
    assert a == pytest.approx(b, rel=rtol)


def test_yeast_loss_on_data_matches():
    from crnn_tpu.cases.yeast import YeastConfig, build

    cfg = YeastConfig(n_exp_train=2, n_exp_val=1, ntotal=16, max_steps=96)
    _check(build(cfg), cfg.ntotal)


def test_case1_rev_loss_on_data_matches():
    from crnn_tpu.cases.case1_rev import Case1RevConfig, build

    cfg = Case1RevConfig(n_exp_train=2, n_exp_test=1, datasize=10)
    _check(build(cfg), cfg.datasize)


def test_robertson_qssa_loss_on_data_matches():
    from crnn_tpu.cases.robertson_qssa import QSSAConfig, build

    cfg = QSSAConfig(n_exp_train=2, n_exp_val=1, datasize=10)
    _check(build(cfg), cfg.datasize)


def test_hychem_loss_on_data_matches():
    from crnn_tpu.cases.hychem import HyChemConfig, build

    cfg = HyChemConfig(ntotal=16, max_steps=96)
    _check(build(cfg), cfg.ntotal)


def test_cathode_loss_on_data_matches():
    from crnn_tpu.cases.cathode import CathodeConfig, build

    cfg = CathodeConfig()
    setup = build(cfg)
    ds = setup.dataset
    n_save = ds.ys.shape[1]
    mask = jnp.ones((n_save,), jnp.float64)
    p = setup.init_params
    for i in (0, 1):
        a = float(setup.trainer.loss_i_exp(p, jnp.asarray(i), mask))
        # cathode's u0 rows carry the experiment index (per-experiment
        # time grids) — the hook must reproduce the indexed loss
        b = float(setup.loss_on_data(p, ds.u0[i], ds.ys[i], mask))
        assert np.isfinite(a)
        assert a == pytest.approx(b, rel=1e-8)


def test_grn_is_a_cli_case():
    from crnn_tpu.cli import CASES

    assert "grn" in CASES

"""Multi-epoch dispatch fusion (train/loop.py epochs_fn / guarded_epochs_fn).

The reference's epoch loop is a host-side ``for`` (case2/case2.jl:192); on
a tunnelled TPU the per-dispatch host->device latency floors the epoch
time, so the framework can fuse k epochs into ONE XLA program. These tests
pin the contract that fusion is a pure performance transform: k fused
epochs produce the same states, best-carry, and per-epoch metrics as k
single-epoch dispatches (same PRNG path — the epoch key splits from the
carried TrainState either way).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from crnn_tpu.train.loop import Trainer


def _make_trainer(loss_i, lr=0.1, n_exp=3, n_train=2, mode="batch",
                  horizon_range=None):
    return Trainer(
        loss_i_exp=loss_i,
        optimizer=optax.adam(lr),
        n_exp_train=n_train,
        n_exp=n_exp,
        n_save=4,
        mode=mode,
        horizon_range=horizon_range,
    )


def _quad_loss(params, i_exp, mask):
    # per-experiment quadratic with a mask-dependent term so stochastic
    # horizons influence the trajectory (exercises the PRNG path)
    tgt = jnp.asarray([1.0, -2.0, 0.5])[i_exp]
    return jnp.sum((params - tgt) ** 2) * jnp.mean(mask)


def test_fused_epochs_match_single_dispatch():
    trainer = _make_trainer(_quad_loss, horizon_range=(2, 4))
    k = 5

    s_ref = trainer.init(jnp.zeros((3,)), seed=7)
    step = trainer.epoch_fn()
    ms_ref = []
    for _ in range(k):
        s_ref, m = step(s_ref)
        ms_ref.append(m)

    s_fused = trainer.init(jnp.zeros((3,)), seed=7)
    s_fused, ms = trainer.epochs_fn(k)(s_fused)

    np.testing.assert_allclose(np.asarray(s_fused.params),
                               np.asarray(s_ref.params), rtol=1e-6)
    assert int(s_fused.epoch) == int(s_ref.epoch) == k
    for e in range(k):
        np.testing.assert_allclose(float(ms.loss_train[e]),
                                   float(ms_ref[e].loss_train), rtol=1e-6)
        np.testing.assert_allclose(float(ms.loss_val[e]),
                                   float(ms_ref[e].loss_val), rtol=1e-6)


def test_guarded_fused_matches_and_guards_mid_chunk():
    # NaN cliff inside the chunk: fused guarding must discard poisoned
    # updates mid-scan exactly like the single-dispatch guarded step
    def loss_i(params, i_exp, mask):
        p0 = params[0]
        return jnp.where(p0 <= 2.0, (p0 - 10.0) ** 2, jnp.nan)

    trainer = _make_trainer(loss_i, lr=0.0, n_exp=2, n_train=2)
    trainer = Trainer(
        loss_i_exp=loss_i, optimizer=optax.sgd(0.05),
        n_exp_train=2, n_exp=2, n_save=4, mode="batch",
    )
    k = 5

    s_ref = trainer.init(jnp.zeros((3,)))
    b_ref = trainer.init_best(s_ref)
    step = trainer.guarded_epoch_fn()
    for _ in range(k):
        s_ref, b_ref, _ = step(s_ref, b_ref)

    s_f = trainer.init(jnp.zeros((3,)))
    b_f = trainer.init_best(s_f)
    s_f, b_f, ms = trainer.guarded_epochs_fn(k)(s_f, b_f)

    assert int(b_f.n_skipped) == int(b_ref.n_skipped) == 3
    np.testing.assert_allclose(float(b_f.loss_val), float(b_ref.loss_val))
    np.testing.assert_allclose(np.asarray(s_f.params),
                               np.asarray(s_ref.params))
    # stacked metrics expose the per-epoch NaNs for host-side logging
    assert ms.loss_train.shape == (k,)
    assert int(jnp.sum(~jnp.isfinite(ms.loss_train))) == 3


def test_fit_epochs_per_dispatch_history_and_remainder():
    trainer = _make_trainer(_quad_loss)
    s0 = trainer.init(jnp.zeros((3,)), seed=3)
    s_a, h_a = trainer.fit(s0, n_epochs=7)
    s_b, h_b = trainer.fit(trainer.init(jnp.zeros((3,)), seed=3),
                           n_epochs=7, epochs_per_dispatch=3)  # 3+3+1
    assert len(h_b["loss_train"]) == 7
    np.testing.assert_allclose(h_b["loss_train"], h_a["loss_train"],
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s_b.params),
                               np.asarray(s_a.params), rtol=1e-6)

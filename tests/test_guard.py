"""Best-params tracking + NaN divergence guard (train/loop.py).

The reference keeps a best-so-far parameter snapshot in its callback
(Cathode/src/callback.jl:122-126) but has no divergence backstop; the
guarded epoch adds both, fully on-device. Engineered blowup: a loss with
a NaN cliff that plain SGD walks straight off — the guard must discard
the poisoned updates and keep the best (pre-cliff) parameters.
"""

import jax
import jax.numpy as jnp
import optax
import pytest

from crnn_tpu.train.loop import Trainer


def _make_trainer(loss_i, lr=0.5, n_exp=2, n_train=2, mode="batch"):
    return Trainer(
        loss_i_exp=loss_i,
        optimizer=optax.sgd(lr),
        n_exp_train=n_train,
        n_exp=n_exp,
        n_save=4,
        mode=mode,
    )


def test_guard_discards_nonfinite_updates():
    # loss = (p0 - 10)^2 while p0 <= 2, NaN beyond: SGD with lr 0.05 takes
    # two healthy steps (p0: 0 -> 1 -> 1.9), then the third lands past the
    # cliff (p0 = 2.71 -> NaN) and every later attempt repeats it.
    def loss_i(params, i_exp, mask):
        p0 = params[0]
        good = (p0 - 10.0) ** 2
        return jnp.where(p0 <= 2.0, good, jnp.nan)

    trainer = _make_trainer(loss_i, lr=0.05)
    state = trainer.init(jnp.zeros((3,)))
    best = trainer.init_best(state)
    step = trainer.guarded_epoch_fn()

    for _ in range(5):
        state, best, m = step(state, best)

    # params must never have been poisoned by a NaN epoch
    assert bool(jnp.all(jnp.isfinite(state.params)))
    assert bool(jnp.all(jnp.isfinite(best.params)))
    assert int(best.n_skipped) == 3
    # the best snapshot is the last pre-cliff point (p0 = 1.9 -> loss 65.61)
    assert float(best.loss_val) == pytest.approx(65.61)
    assert float(best.params[0]) == pytest.approx(1.9)
    # params froze at the last healthy point; epoch counter still advances
    assert float(state.params[0]) == pytest.approx(1.9)
    assert int(state.epoch) == 5


def test_guard_tracks_best_val_through_nonmonotone_descent():
    # loss depends on i_exp so train (i=0) and val (i=1) differ; a large
    # lr makes SGD overshoot and oscillate, so best-val != final-val.
    def loss_i(params, i_exp, mask):
        target = jnp.where(i_exp == 0, 1.0, 1.5)
        return (params[0] - target) ** 2

    trainer = _make_trainer(loss_i, lr=0.95, n_exp=2, n_train=1)
    state = trainer.init(jnp.zeros((1,)))
    best = trainer.init_best(state)
    step = trainer.guarded_epoch_fn()

    vals = []
    for _ in range(8):
        state, best, m = step(state, best)
        vals.append(float(m.loss_val))

    assert int(best.n_skipped) == 0
    assert float(best.loss_val) == pytest.approx(min(vals), rel=1e-6)


def test_guard_matches_unguarded_on_healthy_run():
    def loss_i(params, i_exp, mask):
        return jnp.sum((params - 3.0) ** 2)

    trainer = _make_trainer(loss_i, lr=0.1)
    s_plain = trainer.init(jnp.zeros((2,)))
    s_guard = trainer.init(jnp.zeros((2,)))
    best = trainer.init_best(s_guard)
    plain, guard = trainer.epoch_fn(), trainer.guarded_epoch_fn()

    for _ in range(4):
        s_plain, m_plain = plain(s_plain)
        s_guard, best, m_guard = guard(s_guard, best)

    assert jnp.allclose(s_plain.params, s_guard.params)
    assert float(m_plain.loss_train) == pytest.approx(float(m_guard.loss_train))


def test_run_case_survives_engineered_blowup(tmp_path):
    """End-to-end: run_case with a divergent loss ships a finite artifact."""
    from crnn_tpu.cases.base import CaseSetup, run_case

    def loss_i(params, i_exp, mask):
        p0 = params[0]
        return jnp.where(p0 <= 2.0, (p0 - 10.0) ** 2, jnp.nan)

    trainer = _make_trainer(loss_i, lr=0.05)

    class _DS:
        ys = jnp.zeros((2, 4, 1))
        u0 = jnp.zeros((2, 1))
        ts = jnp.linspace(0, 1, 4)

    from crnn_tpu.models.crnn import CRNNWeights

    w = CRNNWeights(w_in=jnp.zeros((1, 1)), w_b=jnp.zeros((1,)),
                    w_out=jnp.zeros((1, 1)))
    setup = CaseSetup(
        name="guard_blowup",
        trainer=trainer,
        init_params=jnp.zeros((3,)),
        predict=lambda p, i: jnp.zeros((4, 1)),
        weights_fn=lambda p: w,
        dataset=_DS(),
    )
    state, history = run_case(setup, n_epoch=6, out_dir=str(tmp_path),
                              n_plot=100, log_every=0)
    assert bool(jnp.all(jnp.isfinite(state.params)))
    assert history["n_skipped"] >= 1
    assert history["best_val"] == pytest.approx(65.61)
    assert (tmp_path / "guard_blowup" / "p_opt.npy").exists()


def test_restart_preserves_best_across_segments(tmp_path):
    """A continuation segment that only gets WORSE must not overwrite the
    previous segment's best (p_opt.npy) — the best-val carry is persisted
    in best.msgpack and restored on --restart."""
    from crnn_tpu.cases.base import CaseSetup, run_case
    from crnn_tpu.models.crnn import CRNNWeights
    import numpy as np

    def loss_i(params, i_exp, mask):
        return (params[0] - 1.0) ** 2

    class _DS:
        ys = jnp.zeros((2, 4, 1))
        u0 = jnp.zeros((2, 1))
        ts = jnp.linspace(0, 1, 4)

    w = CRNNWeights(w_in=jnp.zeros((1, 1)), w_b=jnp.zeros((1,)),
                    w_out=jnp.zeros((1, 1)))

    def make_setup(lr):
        return CaseSetup(
            name="restart_best",
            trainer=_make_trainer(loss_i, lr=lr, n_exp=2, n_train=1),
            init_params=jnp.zeros((1,)),
            predict=lambda p, i: jnp.zeros((4, 1)),
            weights_fn=lambda p: w,
            dataset=_DS(),
        )

    # segment 1: lr 0.5 converges p0 -> 1 fast (best val ~ 0)
    _, h1 = run_case(make_setup(0.5), n_epoch=5, out_dir=str(tmp_path),
                     n_plot=100, log_every=0)
    p_opt_1 = np.load(tmp_path / "restart_best" / "p_opt.npy").copy()

    # segment 2: lr 2.5 makes SGD diverge (|p0-1| quadruples per step),
    # so this segment's own best is strictly worse than segment 1's
    _, h2 = run_case(make_setup(2.5), n_epoch=5, out_dir=str(tmp_path),
                     n_plot=100, log_every=0, restart=True)

    assert h2["best_val"] == pytest.approx(h1["best_val"])
    p_opt_2 = np.load(tmp_path / "restart_best" / "p_opt.npy")
    np.testing.assert_allclose(p_opt_2, p_opt_1)

"""Data-parallel case training: run_case's ``dp=N`` execution engine.

Shards the experiment axis of a ``CaseSetup`` over an N-device mesh and
trains with one global-mean-loss update per epoch (the 'batch' mode of
train/loop.py, distributed): each device solves its experiment shard,
gradients psum over ICI (parallel/dp.py), parameters stay replicated.
The reference has no distributed backend at all (SURVEY.md §2.2
"Parallelism strategies: NONE") — this is the scaling path for experiment
counts beyond one chip, exposed as a first-class framework feature
(``--dp`` on the case CLIs) rather than a test fixture.

Experiment counts that don't divide the mesh are padded with zero-weight
lanes; the padded lanes solve (cheap, identical program) but contribute
nothing to loss, gradient, or metrics. Padded lanes REPEAT the last real
experiment rather than zero-filling: a zero u0 row is out-of-domain for
RHS features (case2's 1/(R*T) is inf at T=0) and reverse-mode AD turns
the lane's zero cotangent into 0*inf = NaN, which the gradient psum
would spread to every device.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from crnn_tpu.parallel.dp import make_dp_eval, make_dp_train_step
from crnn_tpu.parallel.mesh import make_mesh
from crnn_tpu.train.loop import BestState, TrainState
from crnn_tpu.train.loss import prefix_mask


def _pad_to(arr, n, axis=0, mode="edge"):
    """Pad to n rows. mode='edge' repeats the last real row (in-domain
    data for padded lanes — see module docstring); weights use
    mode='constant' so padded lanes carry zero weight."""
    pad = n - arr.shape[axis]
    if pad <= 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return jnp.pad(arr, widths, mode=mode)


def run_case_dp(
    setup,
    n_epoch: int,
    n_devices: Optional[int] = None,
    out_dir: str = "runs",
    n_plot: int = 50,
    restart: bool = False,
    seed: int = 0,
    log_every: int = 10,
):
    """Train a case data-parallel over the device mesh.

    Semantics = Trainer 'batch' mode (one update per epoch on the mean
    training loss, then a full evaluation pass), distributed. Returns
    (TrainState, history) like run_case.
    """
    if setup.loss_on_data is None:
        raise ValueError(
            f"case {setup.name!r} does not define loss_on_data; "
            "data-parallel training is unavailable for it")
    if setup.trainer.mode == "sequential":
        raise ValueError(
            "dp training uses batch semantics (one global-mean update per "
            "epoch); sequential per-experiment updates cannot shard over "
            "the experiment axis. Use --mode batch with --dp, or drop "
            "--dp for reference-faithful sequential SGD.")
    if getattr(setup.trainer, "grad_mode", "rev") == "fwd":
        import warnings

        warnings.warn(
            "dp training always uses reverse-mode gradients; the case's "
            "grad_mode='fwd' (jacfwd through the early-exit while driver) "
            "does not apply under --dp and its perf characteristics differ",
            stacklevel=2)
    from crnn_tpu.infra.checkpoint import load_checkpoint, save_checkpoint
    from crnn_tpu.infra.metrics import MetricsLogger
    from crnn_tpu.infra.plotting import display_weights, plot_loss_curves

    trainer = setup.trainer
    ds = setup.dataset
    n_devices = n_devices or len(jax.devices())
    mesh = make_mesh(n_devices)

    n_exp = trainer.n_exp
    n_train = trainer.n_exp_train
    # experiments visited by the update (case3 quirk: ALL experiments,
    # train/loop.py n_exp_update)
    n_upd = trainer.n_exp_update or n_train
    n_save = trainer.n_save
    dtype = ds.ys.dtype
    pad_train = -(-n_upd // n_devices) * n_devices
    pad_all = -(-n_exp // n_devices) * n_devices

    shard = NamedSharding(mesh, P("exp"))
    u0_tr = jax.device_put(_pad_to(ds.u0[:n_upd], pad_train), shard)
    ys_tr = jax.device_put(_pad_to(ds.ys[:n_upd], pad_train), shard)
    w_tr = jax.device_put(
        _pad_to(jnp.ones((n_upd,), dtype), pad_train, mode="constant"),
        shard)
    u0_all = jax.device_put(_pad_to(ds.u0, pad_all), shard)
    ys_all = jax.device_put(_pad_to(ds.ys, pad_all), shard)
    mask_all = jax.device_put(jnp.ones((pad_all, n_save), dtype), shard)

    step = make_dp_train_step(setup.loss_on_data, trainer.optimizer, mesh)
    eval_fn = make_dp_eval(setup.loss_on_data, mesh)

    rng = np.random.default_rng(seed)

    def sample_masks():
        if trainer.horizon_range is None:
            return mask_all[:pad_train]
        lo, hi = trainer.horizon_range
        samples = jnp.asarray(rng.integers(lo, hi + 1, size=(pad_train,)))
        masks = jax.vmap(lambda s: prefix_mask(n_save, s, dtype))(samples)
        return jax.device_put(masks, shard)

    run_dir = os.path.join(out_dir, setup.name)
    fig_dir = os.path.join(run_dir, "figs")
    ckpt_path = os.path.join(run_dir, "checkpoint.msgpack")
    os.makedirs(fig_dir, exist_ok=True)

    params = setup.init_params
    opt_state = trainer.optimizer.init(params)
    epoch0 = 0
    state = TrainState(params, opt_state, jnp.asarray(0, jnp.int32),
                       jax.random.PRNGKey(seed))
    if restart and os.path.exists(ckpt_path):
        state = load_checkpoint(ckpt_path, state)
        params, opt_state = state.params, state.opt_state
        epoch0 = int(state.epoch)
        print(f"[{setup.name}] dp restart from {ckpt_path} at epoch {epoch0}")

    logger = MetricsLogger(os.path.join(run_dir, "metrics.jsonl"),
                           print_every=0)
    history = {"loss_train": [], "loss_val": [], "grad_norm": []}

    # on-device best-val params fold (no per-epoch host sync; same policy
    # as Trainer.guarded_epoch_fn / callback.jl:122-126)
    @jax.jit
    def fold_best(best_val, best_train, best_params, lv, lt, p):
        better = jnp.isfinite(lv) & (lv < best_val)
        return (jnp.where(better, lv, best_val),
                jnp.where(better, lt, best_train),
                jax.tree.map(lambda b, x: jnp.where(better, x, b),
                             best_params, p))

    best_val = jnp.asarray(jnp.inf, jnp.float32)
    best_train = jnp.asarray(jnp.inf, jnp.float32)
    # copy: the train step donates its params buffer, so aliasing the
    # initial params here would hand fold_best a deleted array
    best_params = jax.tree.map(jnp.copy, params)
    # best-val carry survives restarts (same policy + file as cases/base.py:
    # a worse continuation segment must not overwrite a better p_opt)
    best_ckpt_path = os.path.join(run_dir, "best.msgpack")
    if restart and os.path.exists(best_ckpt_path):
        b = load_checkpoint(best_ckpt_path, jax.device_get(BestState(
            params=best_params, loss_val=best_val, loss_train=best_train,
            n_skipped=jnp.asarray(0, jnp.int32))))
        best_params = jax.tree.map(jnp.asarray, b.params)
        best_val = jnp.asarray(b.loss_val)
        best_train = jnp.asarray(b.loss_train)
        print(f"[{setup.name}] best-val carry restored "
              f"(val {float(best_val):.4e})")

    def _save_best_carry():
        save_checkpoint(best_ckpt_path, BestState(
            params=best_params, loss_val=best_val, loss_train=best_train,
            n_skipped=jnp.asarray(0, jnp.int32)))
    # device scalars accumulated and flushed in bulk: on the tunneled TPU
    # a float() per epoch is a full host round-trip that serialises the
    # pipeline (same discipline as cases/base.py's batched metric flush)
    pending = []
    t_start = time.time()

    def flush():
        if not pending:
            return
        arr = np.asarray(jnp.stack([jnp.stack(t) for t in pending]))
        history["loss_train"].extend(arr[:, 0].tolist())
        history["loss_val"].extend(arr[:, 1].tolist())
        history["grad_norm"].extend(arr[:, 2].tolist())
        pending.clear()

    for e in range(epoch0, epoch0 + n_epoch):
        masks = sample_masks()
        params, opt_state, loss, gnorm = step(
            params, opt_state, u0_tr, ys_tr, masks, w_tr)
        losses = eval_fn(params, u0_all, ys_all, mask_all)[:n_exp]
        lt = jnp.mean(losses[:n_train])
        lv = jnp.mean(losses[n_train:]) if n_exp > n_train else lt
        best_val, best_train, best_params = fold_best(
            best_val, best_train, best_params,
            lv.astype(jnp.float32), lt.astype(jnp.float32), params)
        pending.append((lt, lv, gnorm))
        if log_every and (e + 1) % log_every == 0:
            flush()
            logger.log(epoch=e + 1, loss_train=history["loss_train"][-1],
                       loss_val=history["loss_val"][-1],
                       grad_norm=history["grad_norm"][-1])
            print(f"[dp x{n_devices}] epoch={e + 1} "
                  f"loss_train={history['loss_train'][-1]:.4e} "
                  f"loss_val={history['loss_val'][-1]:.4e}", flush=True)
        if (e + 1) % n_plot == 0 or e == epoch0 + n_epoch - 1:
            flush()
            display_weights(setup.weights_fn(params), setup.dydt_scale)
            plot_loss_curves(history, os.path.join(fig_dir, "loss.png"))
            state = TrainState(params, opt_state,
                               jnp.asarray(e + 1, jnp.int32), state.key)
            save_checkpoint(ckpt_path, state)
            _save_best_carry()
    flush()

    wall = time.time() - t_start
    print(f"[{setup.name}] dp x{n_devices}: {n_epoch} epochs in {wall:.1f}s "
          f"({wall / max(n_epoch, 1) * 1e3:.1f} ms/epoch)", flush=True)
    state = TrainState(params, opt_state,
                       jnp.asarray(epoch0 + n_epoch, jnp.int32), state.key)
    save_checkpoint(ckpt_path, state)
    _save_best_carry()
    n_skipped = int(np.sum(~np.isfinite(np.asarray(history["loss_train"]))))
    if n_skipped:
        print(f"[{setup.name}] WARNING: {n_skipped} dp epochs produced "
              f"non-finite loss; their updates were discarded", flush=True)
    bv = float(jax.device_get(best_val))
    if np.isfinite(bv):
        bp = jax.device_get(best_params)
        if hasattr(bp, "shape"):
            np.save(os.path.join(run_dir, "p_opt.npy"), np.asarray(bp))
        else:
            leaves, _ = jax.tree.flatten(bp)
            np.savez(os.path.join(run_dir, "p_opt.npz"),
                     *[np.asarray(x) for x in leaves])
        print(f"[{setup.name}] best val {bv:.4e} "
              f"(train {float(jax.device_get(best_train)):.4e}) -> p_opt",
              flush=True)
    history["best_val"] = bv
    history["n_skipped"] = n_skipped
    logger.close()
    return state, history

"""Shared case runner: train loop + observability + checkpoint/restart.

Rebuilds the common tail of every reference script (epoch loop, cb/cbi
callbacks, BSON checkpointing, figure output — e.g. case2/case2.jl:139-207)
once, parameterised by a `CaseSetup`.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from crnn_tpu.infra.checkpoint import load_checkpoint, save_checkpoint
from crnn_tpu.infra.runtime import setup_cache

setup_cache()
from crnn_tpu.infra.metrics import MetricsLogger
from crnn_tpu.infra.plotting import display_weights, plot_experiment, plot_loss_curves
from crnn_tpu.train.loop import Trainer, TrainState


@dataclass
class CaseSetup:
    name: str
    trainer: Trainer
    init_params: Any
    predict: Callable              # (params, i_exp) -> (n_save, n_obs)
    weights_fn: Callable           # params -> CRNNWeights (for display)
    dataset: Any                   # Dataset
    dydt_scale: Optional[jnp.ndarray] = None
    species: Optional[list] = None
    logx_plots: bool = False
    # data-parallel hook: (params, u0_i, ys_i, mask_i) -> scalar loss on
    # explicit data values (index-free, so batch shards can live on
    # different devices); enables run_case(..., dp=N) via parallel/dp.py
    loss_on_data: Optional[Callable] = None
    extras: dict = field(default_factory=dict)


def _save_best(run_dir: str, name: str, best_host, quiet: bool = False):
    """Persist the best-val params snapshot (called at every checkpoint so
    a killed long run keeps its best, and again at the end)."""
    if not float(best_host.loss_val) < float("inf"):
        return
    if hasattr(best_host.params, "shape"):  # flat parameter vector
        np.save(os.path.join(run_dir, "p_opt.npy"),
                np.asarray(best_host.params))
    else:  # pytree (e.g. hybrid MLP params): flat-leaf npz
        leaves, _ = jax.tree.flatten(best_host.params)
        np.savez(os.path.join(run_dir, "p_opt.npz"),
                 *[np.asarray(x) for x in leaves])
    if not quiet:
        print(f"[{name}] best val {float(best_host.loss_val):.4e} "
              f"(train {float(best_host.loss_train):.4e}) -> p_opt",
              flush=True)


def run_case(
    setup: CaseSetup,
    n_epoch: int,
    out_dir: str = "runs",
    n_plot: int = 50,
    restart: bool = False,
    seed: int = 0,
    log_every: int = 10,
    dp: int = 0,
    epochs_per_dispatch: int = 1,
) -> tuple[TrainState, dict]:
    """Train a case end-to-end with periodic observability + checkpoints.

    ``dp>0`` trains data-parallel over a ``dp``-device mesh (``dp=-1`` =
    all visible devices) via parallel/dp_runner.py; requires the case to
    define ``loss_on_data``.

    ``epochs_per_dispatch`` > 1 fuses that many epochs into one XLA
    dispatch (Trainer.guarded_epochs_fn) — amortises per-dispatch latency
    on tunnelled accelerators; metrics stay per-epoch, while plotting /
    checkpointing happen at chunk boundaries. Ignored under ``dp``.
    """
    if dp:
        from crnn_tpu.parallel.dp_runner import run_case_dp

        return run_case_dp(
            setup, n_epoch,
            n_devices=(None if dp < 0 else dp),
            out_dir=out_dir, n_plot=n_plot, restart=restart, seed=seed,
            log_every=log_every,
        )
    run_dir = os.path.join(out_dir, setup.name)
    fig_dir = os.path.join(run_dir, "figs")
    ckpt_path = os.path.join(run_dir, "checkpoint.msgpack")
    os.makedirs(fig_dir, exist_ok=True)

    trainer = setup.trainer
    state = trainer.init(setup.init_params, seed=seed)
    history: dict = {"loss_train": [], "loss_val": [], "grad_norm": []}
    if restart and os.path.exists(ckpt_path):
        state = load_checkpoint(ckpt_path, state)
        print(f"[{setup.name}] restarted from {ckpt_path} at epoch "
              f"{int(state.epoch)}")

    logger = MetricsLogger(os.path.join(run_dir, "metrics.jsonl"),
                           print_every=0)
    # metrics carry ABSOLUTE epoch numbers so restarted runs append a
    # continuous series instead of restarting at 0
    epoch0 = int(state.epoch)
    # guarded step: on-device best-val params (callback.jl:122-126) + NaN
    # divergence guard (a non-finite epoch's update is discarded)
    step = trainer.guarded_epoch_fn()
    best = trainer.init_best(state)
    # best-val carry survives restarts: without this, a continuation
    # segment that never beats the previous segment would overwrite
    # p_opt.npy with its own (worse) best at run end
    best_ckpt_path = os.path.join(run_dir, "best.msgpack")
    if restart and os.path.exists(best_ckpt_path):
        best = load_checkpoint(best_ckpt_path, jax.device_get(best))
        print(f"[{setup.name}] best-val carry restored "
              f"(val {float(best.loss_val):.4e})")
    t_start = time.time()

    # Per-epoch host syncs would serialise the device pipeline; metrics are
    # kept on-device and flushed in batches every `flush_every` epochs.
    flush_every = max(1, log_every or 10)
    pending = []
    t_flush = time.time()

    def _flush(upto_epoch):
        nonlocal pending, t_flush
        if not pending:
            return
        vals = jax.device_get(
            [(m.loss_train, m.loss_val, m.grad_norm) for m in pending]
        )
        n_flushed = 0
        for lt, lv, gn in vals:
            # fused chunks carry stacked (k,) per-epoch metrics
            lt, lv, gn = (np.atleast_1d(np.asarray(x)) for x in (lt, lv, gn))
            history["loss_train"].extend(float(x) for x in lt)
            history["loss_val"].extend(float(x) for x in lv)
            history["grad_norm"].extend(float(x) for x in gn)
            n_flushed += lt.shape[0]
        per_epoch = (time.time() - t_flush) / max(n_flushed, 1)
        logger.log(epoch=upto_epoch, loss_train=history["loss_train"][-1],
                   loss_val=history["loss_val"][-1],
                   grad_norm=history["grad_norm"][-1], epoch_s=per_epoch)
        if log_every:
            print(f"epoch={upto_epoch} loss_train={history['loss_train'][-1]:.4e} "
                  f"loss_val={history['loss_val'][-1]:.4e} "
                  f"epoch_s={per_epoch:.4f}", flush=True)
        pending = []
        t_flush = time.time()

    k_fuse = max(1, int(epochs_per_dispatch))
    step_k = trainer.guarded_epochs_fn(k_fuse) if k_fuse > 1 else None
    e = 0
    while e < n_epoch:
        if step_k is not None and n_epoch - e >= k_fuse:
            state, best, m = step_k(state, best)  # metrics stacked (k,)
            ran = k_fuse
        else:
            state, best, m = step(state, best)
            ran = 1
        pending.append(m)
        e += ran
        if e % flush_every < ran:
            _flush(epoch0 + e)

        if e % n_plot < ran or e == n_epoch:
            _flush(epoch0 + e)
            display_weights(setup.weights_fn(state.params), setup.dydt_scale)
            print(f"[{setup.name}] epoch {int(state.epoch)} "
                  f"min loss train {np.min(history['loss_train']):.4e} "
                  f"val {np.min(history['loss_val']):.4e}", flush=True)
            i_show = int(np.random.default_rng(e).integers(
                0, setup.dataset.ys.shape[0]))
            pred = setup.predict(state.params, jnp.asarray(i_show))
            plot_experiment(
                setup.dataset.ts, np.asarray(setup.dataset.ys[i_show]),
                np.asarray(pred), os.path.join(fig_dir, f"i_exp_{i_show}.png"),
                species=setup.species, logx=setup.logx_plots,
            )
            plot_loss_curves(history, os.path.join(fig_dir, "loss.png"))
            save_checkpoint(ckpt_path, state)
            save_checkpoint(best_ckpt_path, best)
            _save_best(run_dir, setup.name, jax.device_get(best),
                       quiet=True)

    wall = time.time() - t_start
    print(f"[{setup.name}] {n_epoch} epochs in {wall:.1f}s "
          f"({wall / max(n_epoch, 1) * 1e3:.1f} ms/epoch)", flush=True)
    save_checkpoint(ckpt_path, state)
    save_checkpoint(best_ckpt_path, best)
    best_host = jax.device_get(best)
    n_skipped = int(best_host.n_skipped)
    if n_skipped:
        print(f"[{setup.name}] WARNING: {n_skipped} epochs produced "
              f"non-finite loss/grad; their updates were discarded", flush=True)
    _save_best(run_dir, setup.name, best_host)
    history["best_val"] = float(best_host.loss_val)
    history["best_train"] = float(best_host.loss_train)
    history["n_skipped"] = n_skipped
    history["best_params"] = best_host.params
    logger.close()
    return state, history

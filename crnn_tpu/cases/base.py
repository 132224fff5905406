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
    extras: dict = field(default_factory=dict)


def run_case(
    setup: CaseSetup,
    n_epoch: int,
    out_dir: str = "runs",
    n_plot: int = 50,
    restart: bool = False,
    seed: int = 0,
    log_every: int = 10,
) -> tuple[TrainState, dict]:
    """Train a case end-to-end with periodic observability + checkpoints."""
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
                           print_every=log_every)
    step = trainer.epoch_fn()
    t_start = time.time()

    for e in range(n_epoch):
        t0 = time.time()
        state, m = step(state)
        m.loss_train.block_until_ready()  # async dispatch: time the compute
        epoch_s = time.time() - t0
        history["loss_train"].append(float(m.loss_train))
        history["loss_val"].append(float(m.loss_val))
        history["grad_norm"].append(float(m.grad_norm))
        logger.log(epoch=int(state.epoch), loss_train=float(m.loss_train),
                   loss_val=float(m.loss_val), grad_norm=float(m.grad_norm),
                   epoch_s=epoch_s)

        if (e + 1) % n_plot == 0 or e == n_epoch - 1:
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

    wall = time.time() - t_start
    print(f"[{setup.name}] {n_epoch} epochs in {wall:.1f}s "
          f"({wall / max(n_epoch, 1) * 1e3:.1f} ms/epoch)", flush=True)
    save_checkpoint(ckpt_path, state)
    logger.close()
    return state, history

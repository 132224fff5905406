"""Cathode: DSC thermal-decomposition CRNN fit to experimental heat flow.

TPU-native rebuild of /root/reference/Cathode/src/: three sequential
decomposition reactions c1 -> c2 -> c3 with extended Arrhenius kinetics
k_i = exp(lnA_i + b_i ln T - Ea_i/(R T)) under deterministic heating ramps
T(t) = T0 + beta/60 * t; the species ODE is solved per heating-rate curve
and the heat-release rate HRR = rates @ delH is reconstructed post-hoc
(network.jl:82-91,121) and fit to the measured curve by MAE. Heating rate
15 K/min (index 3) is the validation curve (header.jl:47-56).

Differences from the synthetic cases, all handled here:
- ragged experimental curves -> fixed shapes with masks (data/loaders.py)
- per-experiment tspan (solve starts at the first measurement time)
- YAML config with provenance snapshot + loss write-back (infra/config.py)
- best-parameters tracking (callback.jl:122-126)
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from crnn_tpu.cases.base import CaseSetup
from crnn_tpu.data.loaders import DSCData, load_cathode_dir, synthetic_dsc
from crnn_tpu.models.crnn import cathode_hrr, make_cathode_rhs
from crnn_tpu.ode import TRBDF2, get_solver, odesolve
from crnn_tpu.train.loop import Trainer
from crnn_tpu.train.optimizers import adamw_like
from crnn_tpu.transforms.p2vec import init_params_cathode, p2vec_cathode


@dataclass
class CathodeConfig:
    # mirrors Cathode/config.yaml fields
    expr_name: str = "4s8r-01"
    ns: int = 3
    nr: int = 3
    lb: float = 1e-8
    n_epoch: int = 1000
    n_plot: int = 100
    grad_max: float = 1e2
    maxiters: int = 2048
    adam_lr: float = 1e-3
    w_decay: float = 1e-7
    cathode: int = 1
    is_restart: bool = False
    # framework extensions
    data_dir: Optional[str] = None   # None -> synthetic surrogate curves
    val_index: int = 3               # heating rate 15 K/min held out
    solver: str = "trbdf2"
    mode: str = "sequential"
    seed: int = 0
    rtol: float = 1e-4


def build(cfg: CathodeConfig = CathodeConfig()) -> CaseSetup:
    from crnn_tpu.infra.runtime import enable_x64, host_generation

    enable_x64()
    dtype = jnp.float64

    if cfg.data_dir:
        dsc = load_cathode_dir(cfg.data_dir, cfg.cathode)
    else:
        dsc = synthetic_dsc(seed=cfg.seed)
    n_exp = dsc.ts.shape[0]
    # f64 data prep pinned to the host CPU (runtime.host_generation)
    with host_generation():
        ts = jnp.asarray(dsc.ts, dtype)
        hrr_data = jnp.asarray(dsc.hrr, dtype)
        masks = jnp.asarray(dsc.mask, dtype)
        betas = jnp.asarray(dsc.betas, dtype)

        # reorder so training curves come first, validation curve last — the
        # Trainer's split convention (reference skips l_val inside the loop,
        # crnn_cathode.jl:14-16)
        order = [i for i in range(n_exp)
                 if i != cfg.val_index] + [cfg.val_index]
        order = jnp.asarray(order)
        ts, hrr_data, masks, betas = (ts[order], hrr_data[order],
                                      masks[order], betas[order])

    rhs = make_cathode_rhs(cfg.lb)
    solver = get_solver(cfg.solver)
    u0 = jnp.zeros((cfg.ns,), dtype).at[0].set(1.0)  # unity mass of c1
    n_save = ts.shape[1]

    def predict_hrr(p, i_exp, unroll="while"):
        w = p2vec_cathode(p)
        beta = betas[i_exp]
        t_row = ts[i_exp]
        sol = odesolve(
            rhs, solver, u0, t_row[0], t_row[-1], t_row, args=(w, beta),
            rtol=cfg.rtol, atol=cfg.lb, max_steps=cfg.maxiters, unroll=unroll,
        )
        ys = jnp.clip(sol.ys, 0.0, 10.0)
        return cathode_hrr(t_row, ys, w, beta, cfg.lb)

    def loss_i_exp(p, i_exp, mask, unroll="while"):
        pred = predict_hrr(p, i_exp, unroll)
        w = masks[i_exp] * mask
        return jnp.sum(jnp.abs(pred - hrr_data[i_exp]) * w) / jnp.sum(w)

    trainer = Trainer(
        loss_i_exp=lambda p, i, m: loss_i_exp(p, i, m, "scan"),
        loss_i_exp_eval=loss_i_exp,
        optimizer=adamw_like(cfg.adam_lr, weight_decay=cfg.w_decay,
                             grad_max=cfg.grad_max),
        n_exp_train=n_exp - 1,
        n_exp=n_exp,
        n_save=n_save,
        mode=cfg.mode,
        # 18 parameters: forward-mode AD through the early-exiting while
        # driver (the reference's ForwardDiff path, crnn_cathode.jl:17)
        grad_mode="fwd",
    )

    def loss_on_data(p, u0_i, ys_i, mask_i, unroll="scan"):
        # dp sharding hook: the _DS.u0 row doubles as the experiment index
        # (each experiment has its own time grid/beta, so the loss gathers
        # the replicated ts/betas/masks constants through it)
        i = u0_i.astype(jnp.int32)
        pred = predict_hrr(p, i, unroll)
        w = masks[i] * mask_i
        return jnp.sum(jnp.abs(pred - ys_i[:, 0]) * w) / jnp.sum(w)

    key = jax.random.PRNGKey(cfg.seed)

    ts_row0 = np.asarray(ts[0])

    class _DS:  # minimal Dataset-like view for the shared runner
        u0 = jnp.arange(n_exp)
        ys = hrr_data[:, :, None]
        ts = ts_row0
        yscale = jnp.ones((1,))
        success = jnp.ones((n_exp,), bool)

    setup = CaseSetup(
        name="cathode",
        trainer=trainer,
        init_params=init_params_cathode(key, dtype=dtype),
        predict=jax.jit(lambda p, i: predict_hrr(p, i)[:, None]),
        weights_fn=p2vec_cathode,
        dataset=_DS(),
        species=["HRR"],
        loss_on_data=loss_on_data,
    )
    setup.extras["dsc"] = dsc
    setup.extras["config"] = cfg
    setup.extras["predict_hrr"] = predict_hrr
    return setup


def run_cathode(cfg: CathodeConfig, out_dir: str = "runs",
                config_yaml: Optional[str] = None):
    """Full Cathode driver with results-dir lifecycle, best-p tracking and
    loss write-back (header.jl:60-86, crnn_cathode.jl:44-46)."""
    import time

    from crnn_tpu.infra.checkpoint import load_checkpoint, save_checkpoint
    from crnn_tpu.infra.config import snapshot_config, writeback_results
    from crnn_tpu.infra.metrics import MetricsLogger

    setup = build(cfg)
    results_dir = os.path.join(out_dir, "cathode", cfg.expr_name)
    os.makedirs(results_dir, exist_ok=True)
    snap_path = None
    if config_yaml and os.path.exists(config_yaml):
        snap_path = snapshot_config(config_yaml, results_dir)

    trainer = setup.trainer
    state = trainer.init(setup.init_params, seed=cfg.seed)
    ckpt = os.path.join(results_dir, "checkpoint.msgpack")
    if cfg.is_restart and os.path.exists(ckpt):
        state = load_checkpoint(ckpt, state)

    step = trainer.epoch_fn()
    logger = MetricsLogger(os.path.join(results_dir, "metrics.jsonl"),
                           print_every=max(cfg.n_plot // 10, 1))
    best = {"loss_train": np.inf, "loss_val": np.inf, "params": None}
    t0 = time.time()
    for e in range(cfg.n_epoch):
        state, m = step(state)
        lt, lv = float(m.loss_train), float(m.loss_val)
        logger.log(epoch=int(state.epoch), loss_train=lt, loss_val=lv,
                   grad_norm=float(m.grad_norm))
        if lt < best["loss_train"]:
            # best-so-far tracking keyed on train loss (callback.jl:122-126)
            best.update(loss_train=lt, loss_val=lv,
                        params=np.asarray(jax.device_get(state.params)))
        if (e + 1) % cfg.n_plot == 0:
            save_checkpoint(ckpt, state)
    save_checkpoint(ckpt, state)
    np.save(os.path.join(results_dir, "p_opt.npy"), best["params"])
    if snap_path:
        writeback_results(snap_path, {
            "loss_train": best["loss_train"], "loss_val": best["loss_val"],
        })
    print(f"[cathode] {cfg.n_epoch} epochs in {time.time()-t0:.1f}s; "
          f"best train {best['loss_train']:.4e} val {best['loss_val']:.4e}")
    return state, best


if __name__ == "__main__":
    import argparse

    from crnn_tpu.infra.config import config_from_yaml

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None, help="YAML config path")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--out", default="runs")
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel over N devices (-1 = all); uses the "
                         "generic dp runner instead of the YAML lifecycle")
    args = ap.parse_args()
    if args.config:
        cfg = config_from_yaml(CathodeConfig, args.config)
    else:
        cfg = CathodeConfig()
    if args.epochs is not None:
        cfg.n_epoch = args.epochs
    if args.data_dir:
        cfg.data_dir = args.data_dir
    if args.dp:
        from crnn_tpu.cases.base import run_case

        cfg.mode = "batch"  # dp requires batch semantics (dp_runner.py)
        run_case(build(cfg), n_epoch=cfg.n_epoch, out_dir=args.out,
                 restart=cfg.is_restart, dp=args.dp)
    else:
        run_cathode(cfg, out_dir=args.out, config_yaml=args.config)

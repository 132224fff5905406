"""case3: MAPK signalling cascade (9 species / 8 reactions) + GRN variant.

TPU-native rebuild of /root/reference/case3/case3.jl: 100 experiments with
log-uniform initial conditions, log-space MAE loss, product-tied p2vec
(w_out = -w_in*|w_out|), dy/dt rescaling by the data-derived dy_std, NADAM.
The gene-regulatory-network case (gene-regulatory.jl) shares this exact
structure with a different truth model, nr=15, frozen DNA rows in w_out and
a plain scaled-MAE loss — exposed here via ``variant='grn'``.
Relative pruning (case3_pruning.jl / gene-regulatory-pruning.jl) via
``p_cutoff``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from crnn_tpu.cases.base import CaseSetup, run_case
from crnn_tpu.data.generate import generate_dataset
from crnn_tpu.data.truth import CASE3_K, GRN_K, case3_truth, grn_truth
from crnn_tpu.models.crnn import make_crnn_scaled_rhs
from crnn_tpu.ode import Tsit5, odesolve
from crnn_tpu.train.loop import Trainer
from crnn_tpu.train.loss import make_trajectory_loss
from crnn_tpu.train.optimizers import adamw_like, expdecay_adamw, nadam_like
from crnn_tpu.transforms.p2vec import init_params_case3, p2vec_case3
from crnn_tpu.transforms.pruning import relative_threshold, hard_threshold


@dataclass
class Case3Config:
    # reference constants: case3/case3.jl:15-39 ; grn: gene-regulatory.jl:15-33
    variant: str = "case3"        # 'case3' | 'grn'
    ns: int = 9
    nr: int = 8
    datasize: int = 100
    tstep: float = 0.1
    n_exp_train: int = 70
    n_exp_test: int = 30
    noise: float = 5e-2
    lr: float = 1e-3
    grad_max: float = 100.0   # robustness clip (reference trains unclipped)
    atol: float = 1e-5
    rtol: float = 1e-2
    lb: float = 1e-5
    ub: float = 100.0
    p_cutoff: float = 0.0
    seed: int = 1234
    max_steps: int = 192
    mode: str = "batch"
    dtype: str = "float32"
    horizon: Optional[tuple] = None
    # staircase lr decay (ExpDecay analogue); 0 steps = constant lr.
    # The reference restarts GRN manually with a lowered lr
    # (gene-regulatory.jl:15 is_restart=true); a schedule automates that
    # and prevents the late-run divergence seen at constant lr.
    lr_decay: float = 0.5
    lr_decay_steps: int = 0
    lr_floor: float = 1e-5

    @property
    def n_exp(self) -> int:
        return self.n_exp_train + self.n_exp_test


def grn_config() -> Case3Config:
    """gene-regulatory.jl:15-33: nr=15, 40x0.1 horizon, 1% noise, ADAMW,
    stochastic truncation batch = rand(2:datasize) (:258)."""
    return Case3Config(variant="grn", nr=15, datasize=40, noise=1e-2,
                       horizon=(2, 40))


def build(cfg: Case3Config = Case3Config()) -> CaseSetup:
    dtype = jnp.dtype(cfg.dtype)
    key = jax.random.PRNGKey(cfg.seed)
    k_u0, k_noise, k_p = jax.random.split(key, 3)

    if cfg.variant == "case3":
        # log-uniform u0 = 10^(U(0,1)*-3); experiments {0,1,last} zero the
        # activated species [2,4,6,8] (case3/case3.jl:106-107)
        u0 = 10.0 ** (jax.random.uniform(k_u0, (cfg.n_exp, cfg.ns), dtype) * -3.0)
        zero_rows = jnp.asarray([0, 1, cfg.n_exp - 1])
        u0 = u0.at[zero_rows[:, None], jnp.asarray([2, 4, 6, 8])[None, :]].set(0.0)
        truth, k = case3_truth, CASE3_K.astype(dtype)
        frozen_rows = None
    else:  # grn
        u0 = jax.random.uniform(k_u0, (cfg.n_exp, cfg.ns), dtype)
        truth, k = grn_truth, GRN_K.astype(dtype)
        frozen_rows = (0, 3, 6)   # DNA species (gene-regulatory.jl:44)

    t1 = float(cfg.datasize * cfg.tstep)
    saveat = jnp.linspace(0.0, t1, cfg.datasize, dtype=dtype)
    dataset = generate_dataset(
        k_noise, truth, Tsit5(), u0, k, 0.0, t1, saveat,
        rtol=1e-6, atol=1e-8, noise=cfg.noise,
        scale_mode="max_min", scale_lb=cfg.lb,
    )
    # dy/dt scale: y_std / t_end (case3/case3.jl:147-149)
    dydt_scale = dataset.yscale / t1

    rhs = make_crnn_scaled_rhs(cfg.lb, cfg.ub, dydt_scale)
    solver = Tsit5()

    def weights_fn(p):
        w = p2vec_case3(p, cfg.ns, cfg.nr, frozen_rows=frozen_rows)
        if cfg.p_cutoff > 0:
            # relative-to-rowmax pruning (case3_pruning.jl:243-248)
            w = w._replace(
                w_out=relative_threshold(w.w_out, dydt_scale, cfg.p_cutoff),
                w_in=hard_threshold(w.w_in, cfg.p_cutoff),
            )
        return w

    def predict_from_u0(p, u0_i, unroll="scan"):
        w = weights_fn(p)
        sol = odesolve(
            rhs, solver, u0_i, 0.0, t1, saveat, args=w,
            rtol=cfg.rtol, atol=cfg.atol, max_steps=cfg.max_steps,
            unroll=unroll,
        )
        return jnp.clip(sol.ys, cfg.lb, cfg.ub)

    if cfg.variant == "case3":
        # log-space loss with data clamped into [lb, ub] (case3.jl:183-190)
        loss_fn = make_trajectory_loss("log_mae", clip_lb=cfg.lb, clip_ub=cfg.ub)
        optimizer = nadam_like(cfg.lr, grad_max=cfg.grad_max or None)
        n_exp_update = cfg.n_exp   # case3.jl:263 trains on ALL experiments
    else:
        loss_fn = make_trajectory_loss("mae", yscale=dataset.yscale)
        if cfg.lr_decay_steps > 0:
            optimizer = expdecay_adamw(
                cfg.lr, cfg.lr_decay, cfg.lr_decay_steps, cfg.lr_floor,
                weight_decay=1e-6, grad_max=cfg.grad_max or None)
        else:
            optimizer = adamw_like(cfg.lr, weight_decay=1e-6,
                                   grad_max=cfg.grad_max or None)
        n_exp_update = None

    def loss_i_exp(p, i_exp, mask, unroll="scan"):
        pred = predict_from_u0(p, dataset.u0[i_exp], unroll)
        data = dataset.ys[i_exp]
        if cfg.variant == "case3":
            data = jnp.clip(data, cfg.lb, cfg.ub)
        return loss_fn(pred, data, mask)

    def loss_i_exp_eval(p, i_exp, mask):
        return loss_i_exp(p, i_exp, mask, unroll="while")

    def loss_on_data(p, u0_i, ys_i, mask_i, unroll="scan"):
        # index-free loss for data-parallel sharding (parallel/dp_runner.py);
        # eval passes request the early-exit while driver via unroll
        if cfg.variant == "case3":
            ys_i = jnp.clip(ys_i, cfg.lb, cfg.ub)
        return loss_fn(predict_from_u0(p, u0_i, unroll), ys_i, mask_i)

    trainer = Trainer(
        loss_i_exp=loss_i_exp,
        loss_i_exp_eval=loss_i_exp_eval,
        optimizer=optimizer,
        n_exp_train=cfg.n_exp_train,
        n_exp=cfg.n_exp,
        n_save=cfg.datasize,
        mode=cfg.mode,
        horizon_range=cfg.horizon,
        n_exp_update=n_exp_update,
    )

    return CaseSetup(
        name=cfg.variant,
        trainer=trainer,
        init_params=init_params_case3(k_p, cfg.ns, cfg.nr, dtype=dtype),
        predict=jax.jit(lambda p, i: predict_from_u0(p, dataset.u0[i])),
        weights_fn=weights_fn,
        dataset=dataset,
        dydt_scale=dydt_scale,
        loss_on_data=loss_on_data,
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--variant", default="case3", choices=["case3", "grn"])
    ap.add_argument("--mode", default="batch")
    ap.add_argument("--p-cutoff", type=float, default=0.0)
    ap.add_argument("--restart", action="store_true")
    ap.add_argument("--out", default="runs")
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel over N devices (-1 = all)")
    ap.add_argument("--epochs-per-dispatch", type=int, default=1,
                    help="fuse N epochs per XLA dispatch (amortises "
                         "host->device latency on long runs)")
    args = ap.parse_args()
    cfg = grn_config() if args.variant == "grn" else Case3Config()
    cfg.mode = args.mode
    cfg.p_cutoff = args.p_cutoff
    setup = build(cfg)
    run_case(setup, n_epoch=args.epochs, out_dir=args.out,
             restart=args.restart, dp=args.dp,
             epochs_per_dispatch=args.epochs_per_dispatch)

"""case1: isothermal synthetic CRNN (5 species / 4 reactions).

TPU-native rebuild of /root/reference/case1/case1.jl: 30 experiments
(20 train / 10 test) of a 4-reaction mass-action system with 5% noise;
sign-tied p2vec (w_in = clamp(-w_out, 0, 2.5), bias offset b0 = -10);
Tsit5; scaled-MAE loss. The `p_cutoff` option reproduces
case1_hardthreshhold.jl (prune |w_out| < cutoff, then evaluate/fine-tune).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from crnn_tpu.cases.base import CaseSetup, run_case
from crnn_tpu.data.generate import generate_dataset
from crnn_tpu.data.truth import CASE1_K, case1_truth
from crnn_tpu.models.crnn import make_crnn_rhs
from crnn_tpu.ode import Tsit5, odesolve
from crnn_tpu.train.loop import Trainer
from crnn_tpu.train.loss import make_trajectory_loss
from crnn_tpu.train.optimizers import adamw_like, expdecay_adamw
from crnn_tpu.transforms.p2vec import init_params_case1, p2vec_case1
from crnn_tpu.transforms.pruning import prune_case2_params


@dataclass
class Case1Config:
    # reference constants: case1/case1.jl:13-33
    ns: int = 5
    nr: int = 4
    datasize: int = 100
    tstep: float = 0.4
    n_exp_train: int = 20
    n_exp_test: int = 10
    noise: float = 5e-2
    lr: float = 1e-3
    lr_decay: float = 1.0          # 1.0 = constant lr (reference default)
    lr_decay_epochs: int = 2000
    lr_floor: float = 1e-4
    grad_max: float = 0.0          # 0 = no clipping (reference default)
    weight_decay: float = 1e-8
    atol: float = 1e-5
    rtol: float = 1e-2
    lb: float = 1e-5
    ub: float = 10.0
    b0: float = -10.0
    p_cutoff: float = 0.0
    seed: int = 1234
    max_steps: int = 128
    mode: str = "batch"        # 'batch' (TPU-first) or 'sequential' (faithful)
    dtype: str = "float32"

    @property
    def n_exp(self) -> int:
        return self.n_exp_train + self.n_exp_test


def build(cfg: Case1Config = Case1Config()) -> CaseSetup:
    dtype = jnp.dtype(cfg.dtype)
    key = jax.random.PRNGKey(cfg.seed)
    k_u0, k_noise, k_p = jax.random.split(key, 3)

    # -- data (case1/case1.jl:46-67): u0 ~ U(0,1), first two species +0.2,
    #    rest zeroed; multiplicative 5% noise; max-min + lb global scale.
    u0 = jax.random.uniform(k_u0, (cfg.n_exp, cfg.ns), dtype)
    u0 = u0.at[:, :2].add(0.2)
    u0 = u0.at[:, 2:].set(0.0)
    t1 = cfg.datasize * cfg.tstep
    saveat = jnp.linspace(0.0, t1, cfg.datasize, dtype=dtype)
    dataset = generate_dataset(
        k_noise, case1_truth, Tsit5(), u0, CASE1_K.astype(dtype),
        0.0, t1, saveat, rtol=1e-6, atol=1e-8, noise=cfg.noise,
        scale_mode="max_min", scale_lb=cfg.lb,
    )

    # -- model
    rhs = make_crnn_rhs(cfg.lb, cfg.ub)
    solver = Tsit5()

    def weights_fn(p):
        if cfg.p_cutoff > 0:
            p = prune_case2_params(p, cfg.ns, cfg.nr, cfg.p_cutoff)
        return p2vec_case1(p, cfg.ns, cfg.nr, cfg.b0)

    def predict_from_u0(p, u0_i, unroll="scan"):
        w = weights_fn(p)
        sol = odesolve(
            rhs, solver, u0_i, 0.0, t1, saveat, args=w,
            rtol=cfg.rtol, atol=cfg.atol, max_steps=cfg.max_steps,
            unroll=unroll,
        )
        return jnp.clip(sol.ys, -cfg.ub, cfg.ub)

    loss_fn = make_trajectory_loss("mae", yscale=dataset.yscale)

    def loss_i_exp(p, i_exp, mask, unroll="scan"):
        pred = predict_from_u0(p, dataset.u0[i_exp], unroll)
        return loss_fn(pred, dataset.ys[i_exp], mask)

    def loss_i_exp_eval(p, i_exp, mask):
        # gradient-free eval pass: early-exiting while driver
        return loss_i_exp(p, i_exp, mask, unroll="while")

    def loss_on_data(p, u0_i, ys_i, mask_i, unroll="scan"):
        # index-free loss for data-parallel sharding (parallel/dp_runner.py);
        # eval passes request the early-exit while driver via unroll
        return loss_fn(predict_from_u0(p, u0_i, unroll), ys_i, mask_i)

    trainer = Trainer(
        loss_i_exp=loss_i_exp,
        loss_i_exp_eval=loss_i_exp_eval,
        optimizer=(
            adamw_like(cfg.lr, weight_decay=cfg.weight_decay,
                       grad_max=cfg.grad_max or None)
            if cfg.lr_decay >= 1.0
            else expdecay_adamw(
                cfg.lr, cfg.lr_decay,
                cfg.lr_decay_epochs * (cfg.n_exp_train if cfg.mode == "sequential" else 1),
                cfg.lr_floor, weight_decay=cfg.weight_decay,
                grad_max=cfg.grad_max or None,
            )
        ),
        n_exp_train=cfg.n_exp_train,
        n_exp=cfg.n_exp,
        n_save=cfg.datasize,
        mode=cfg.mode,
    )

    return CaseSetup(
        name="case1",
        trainer=trainer,
        init_params=init_params_case1(k_p, cfg.ns, cfg.nr, dtype=dtype),
        predict=jax.jit(lambda p, i: predict_from_u0(p, dataset.u0[i])),
        weights_fn=weights_fn,
        dataset=dataset,
        species=["A", "B", "C", "D", "E"],
        loss_on_data=loss_on_data,
    )


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--mode", default="batch")
    ap.add_argument("--restart", action="store_true")
    ap.add_argument("--p-cutoff", type=float, default=0.0)
    ap.add_argument("--out", default="runs")
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel over N devices (-1 = all)")
    args = ap.parse_args()
    setup = build(Case1Config(mode=args.mode, p_cutoff=args.p_cutoff))
    run_case(setup, n_epoch=args.epochs, out_dir=args.out,
             restart=args.restart, dp=args.dp)

"""yeast-glycolysis: hidden-species hybrid CRNN.

TPU-native rebuild of /root/reference/yeast-glycolysis/yeast_glycolysis.jl:
7 observed species, 12 total — an MLP (7 -> 5, gelu/softplus) infers the 5
hidden species inside the RHS; a learned constant influx w_J is added
per observed species; std-based normalisation; ExpDecay∘ADAMW; stochastic
prefix horizons batch = rand(32:300); AutoTsit5(TRBDF2) solve.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from crnn_tpu.cases.base import CaseSetup, run_case
from crnn_tpu.data.generate import generate_dataset
from crnn_tpu.data.truth import YEAST_IC_LB, YEAST_IC_UB, YEAST_K, yeast_truth
from crnn_tpu.models.crnn import make_crnn_yeast_rhs
from crnn_tpu.models.mlp import make_mlp
from crnn_tpu.ode import TRBDF2, get_solver, odesolve
from crnn_tpu.train.loop import Trainer
from crnn_tpu.train.loss import make_trajectory_loss
from crnn_tpu.train.optimizers import expdecay_adamw
from crnn_tpu.transforms.p2vec import init_params_yeast, p2vec_yeast


@dataclass
class YeastConfig:
    # reference constants: yeast_glycolysis.jl:15-40
    ns: int = 7
    ns_: int = 12
    nr: int = 12
    ntotal: int = 300
    batch_min: int = 32
    n_exp_train: int = 20
    n_exp_val: int = 10
    noise: float = 1e-3
    atol: float = 1e-5
    rtol: float = 1e-2
    lr0: float = 5e-3
    lr_decay: float = 0.5
    lr_decay_epochs: int = 100
    lr_floor: float = 1e-5
    weight_decay: float = 1e-6
    seed: int = 1234
    max_steps: int = 384
    solver: str = "trbdf2"
    mode: str = "batch"
    dtype: str = "float32"
    # hidden width of the observed->hidden MLP. 0 = reference structure
    # (node = ns_ - ns = 5 per hidden layer, yeast_glycolysis.jl:128-133);
    # >0 widens the three hidden layers only (output stays ns_ - ns) for
    # the round-5 capacity ablation.
    mlp_width: int = 0

    @property
    def n_exp(self) -> int:
        return self.n_exp_train + self.n_exp_val

    @property
    def tstep(self) -> float:
        return 5.0 / self.ntotal

    @property
    def lb(self) -> float:
        return self.atol  # yeast_glycolysis.jl:36: lb = atol

    @property
    def ub(self) -> float:
        return 100.0


def build(cfg: YeastConfig = YeastConfig()) -> CaseSetup:
    dtype = jnp.dtype(cfg.dtype)
    key = jax.random.PRNGKey(cfg.seed)
    k_u0, k_noise, k_p, k_mlp = jax.random.split(key, 4)

    # u0 uniform in the published per-species IC box (yeast_glycolysis.jl:69-74)
    u = jax.random.uniform(k_u0, (cfg.n_exp, cfg.ns), dtype)
    u0 = YEAST_IC_LB.astype(dtype) + u * (YEAST_IC_UB - YEAST_IC_LB).astype(dtype)

    t1 = float(cfg.ntotal * cfg.tstep)
    saveat = jnp.linspace(0.0, t1, cfg.ntotal, dtype=dtype)
    dataset = generate_dataset(
        k_noise, yeast_truth, TRBDF2(), u0, YEAST_K.astype(dtype),
        0.0, t1, saveat, rtol=1e-6, atol=1e-8, noise=cfg.noise,
        scale_mode="std", scale_lb=cfg.lb,
    )

    # hybrid MLP: observed (7,) -> hidden (5,) (yeast_glycolysis.jl:128-136)
    node = cfg.ns_ - cfg.ns
    width = cfg.mlp_width or node
    mlp_params, mlp_apply = make_mlp(
        k_mlp, [cfg.ns, width, width, width, node],
        ["gelu", "gelu", "gelu", "softplus"], dtype,
    )
    rhs = make_crnn_yeast_rhs(cfg.lb, cfg.ub, cfg.ns, mlp_apply)
    solver = get_solver(cfg.solver)

    def split_params(params):
        return params["crnn"], params["mlp"]

    def weights_fn(params):
        return p2vec_yeast(split_params(params)[0], cfg.ns, cfg.ns_, cfg.nr)

    def predict_from_u0(params, u0_i, unroll="scan"):
        pcrnn, pmlp = split_params(params)
        w = p2vec_yeast(pcrnn, cfg.ns, cfg.ns_, cfg.nr)
        sol = odesolve(
            rhs, solver, u0_i, 0.0, t1, saveat, args=(w, pmlp),
            rtol=cfg.rtol, atol=cfg.atol, max_steps=cfg.max_steps,
            unroll=unroll,
        )
        return jnp.clip(sol.ys, cfg.lb, cfg.ub)

    loss_fn = make_trajectory_loss("mae", yscale=dataset.yscale)

    def loss_i_exp(params, i_exp, mask, unroll="scan"):
        pred = predict_from_u0(params, dataset.u0[i_exp], unroll)
        data = jnp.clip(dataset.ys[i_exp], cfg.lb, cfg.ub)
        return loss_fn(pred, data, mask)

    def loss_i_exp_eval(params, i_exp, mask):
        return loss_i_exp(params, i_exp, mask, unroll="while")

    def loss_on_data(params, u0_i, ys_i, mask_i, unroll="scan"):
        # index-free loss for data-parallel sharding (parallel/dp_runner.py)
        pred = predict_from_u0(params, u0_i, unroll)
        return loss_fn(pred, jnp.clip(ys_i, cfg.lb, cfg.ub), mask_i)

    updates_per_epoch = cfg.n_exp_train if cfg.mode == "sequential" else 1
    trainer = Trainer(
        loss_i_exp=loss_i_exp,
        loss_i_exp_eval=loss_i_exp_eval,
        optimizer=expdecay_adamw(
            cfg.lr0, cfg.lr_decay, cfg.lr_decay_epochs * updates_per_epoch,
            cfg.lr_floor, weight_decay=cfg.weight_decay,
        ),
        n_exp_train=cfg.n_exp_train,
        n_exp=cfg.n_exp,
        n_save=cfg.ntotal,
        mode=cfg.mode,
        horizon_range=(cfg.batch_min, cfg.ntotal),
    )

    init_params = {
        "crnn": init_params_yeast(k_p, cfg.ns, cfg.ns_, cfg.nr, dtype=dtype),
        "mlp": mlp_params,
    }
    setup = CaseSetup(
        name="yeast",
        trainer=trainer,
        init_params=init_params,
        predict=jax.jit(lambda p, i: predict_from_u0(p, dataset.u0[i])),
        weights_fn=weights_fn,
        dataset=dataset,
        loss_on_data=loss_on_data,
    )
    setup.extras["mlp_apply"] = mlp_apply
    return setup


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--mode", default="batch")
    ap.add_argument("--restart", action="store_true")
    ap.add_argument("--out", default="runs")
    ap.add_argument("--lr0", type=float, default=None)
    ap.add_argument("--lr-decay-epochs", type=int, default=None)
    ap.add_argument("--max-steps", type=int, default=None,
                    help="adaptive-solver step budget per solve (the learned "
                         "RHS can be stiffer than the truth mid-training; "
                         "384 exhausts at t~3.8 of 5.0 and zero-fills the "
                         "tail, poisoning full-horizon loss/gradients)")
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel over N devices (-1 = all)")
    ap.add_argument("--mlp-width", type=int, default=0,
                    help="hidden width of the 7->5 MLP (0 = reference 5)")
    args = ap.parse_args()
    cfg = YeastConfig(mode=args.mode, mlp_width=args.mlp_width)
    if args.lr0 is not None:
        cfg.lr0 = args.lr0
    if args.lr_decay_epochs is not None:
        cfg.lr_decay_epochs = args.lr_decay_epochs
    if args.max_steps is not None:
        cfg.max_steps = args.max_steps
    setup = build(cfg)
    run_case(setup, n_epoch=args.epochs, out_dir=args.out,
             restart=args.restart, dp=args.dp)

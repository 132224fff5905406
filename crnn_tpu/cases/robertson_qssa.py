"""Robertson QSSA hybrid: the fast radical is an MLP, not a solved state.

TPU-native rebuild of /root/reference/robertson/rober_crnn_qssa.jl: inside
the RHS the quasi-steady-state species y2 is predicted by an MLP(y1, y3)
(2 -> 4 -> 4 -> 4 -> 1, gelu/exp output), so the solver only integrates the
slow manifold; after the solve, the y2 trajectory is re-predicted from the
solved (y1, y3) (rober_crnn_qssa.jl:132-147). Loss on species (0, 2) only.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from crnn_tpu.cases.base import CaseSetup, run_case
from crnn_tpu.data.generate import generate_dataset
from crnn_tpu.data.truth import ROBERTSON_K, robertson_truth
from crnn_tpu.models.crnn import make_crnn_qssa_rhs
from crnn_tpu.models.mlp import make_mlp
from crnn_tpu.ode import Rosenbrock23, odesolve
from crnn_tpu.train.loop import Trainer
from crnn_tpu.train.loss import make_trajectory_loss
from crnn_tpu.train.optimizers import adamw_like
from crnn_tpu.transforms.p2vec import CRNNWeights


@dataclass
class QSSAConfig:
    # reference constants: rober_crnn_qssa.jl:17-35
    ns: int = 3
    nr: int = 3
    datasize: int = 40
    n_exp_train: int = 20
    n_exp_val: int = 10
    noise: float = 1e-4
    lr: float = 5e-3
    weight_decay: float = 1e-6
    atol: float = 1e-5
    rtol: float = 1e-3
    lb: float = 1e-5
    ub: float = 10.0
    seed: int = 1234
    max_steps: int = 256
    mode: str = "batch"

    @property
    def n_exp(self) -> int:
        return self.n_exp_train + self.n_exp_val


def p2vec_qssa(p, ns: int, nr: int):
    """slope*10 bias scaling, product-tied w_out = -w_in*|w_out|
    (rober_crnn_qssa.jl:81-93)."""
    slope = jnp.abs(p[-1]) * 10.0
    w_b = p[:nr] * slope
    w_in = p[nr * (ns + 1):nr * (2 * ns + 1)].reshape(ns, nr)
    w_out = -w_in * jnp.abs(p[nr:nr * (ns + 1)].reshape(ns, nr))
    w_in = jnp.clip(w_in, 0.0, 2.5)
    return CRNNWeights(w_in=w_in, w_b=w_b, w_out=w_out)


def build(cfg: QSSAConfig = QSSAConfig()) -> CaseSetup:
    from crnn_tpu.infra.runtime import enable_x64, host_generation

    enable_x64()
    dtype = jnp.float64
    key = jax.random.PRNGKey(cfg.seed)
    k_u0, k_noise, k_p, k_mlp = jax.random.split(key, 4)

    # f64 truth generation pinned to the host CPU (see runtime.host_generation)
    with host_generation():
        # u0 ~ U(0,1)+0.5, radical starts at lb (rober_crnn_qssa.jl:38-39)
        u0 = jax.random.uniform(k_u0, (cfg.n_exp, cfg.ns), dtype) + 0.5
        u0 = u0.at[:, 1].set(cfg.lb)

        saveat = 10.0 ** jnp.linspace(-2.0, 5.0, cfg.datasize).astype(dtype)
        t1 = float(saveat[-1])
        dataset = generate_dataset(
            k_noise, robertson_truth, Rosenbrock23(), u0,
            ROBERTSON_K.astype(dtype), 0.0, t1, saveat,
            rtol=1e-8, atol=jnp.array([1e-10, 1e-12, 1e-10]),
            noise=cfg.noise, scale_mode="none",
        )

    mlp_params, mlp_apply = make_mlp(
        k_mlp, [2, 4, 4, 4, 1], ["gelu", "gelu", "gelu", "exp"], dtype,
    )
    rhs = make_crnn_qssa_rhs(cfg.lb, cfg.ub, mlp_apply, exp_cap=32.0)
    solver = Rosenbrock23()

    np_crnn = cfg.nr * (2 * cfg.ns + 1) + 1

    def weights_fn(params):
        return p2vec_qssa(params["crnn"], cfg.ns, cfg.nr)

    def predict_from_u0(params, u0_i, unroll="scan"):
        w = weights_fn(params)
        sol = odesolve(
            rhs, solver, u0_i, 0.0, t1, saveat, args=(w, params["mlp"]),
            rtol=cfg.rtol, atol=cfg.atol, max_steps=cfg.max_steps,
            unroll=unroll,
        )
        ys = sol.ys
        # post-solve: re-predict the QSS radical from the solved (y1, y3)
        y2 = jax.vmap(lambda row: mlp_apply(params["mlp"],
                                            jnp.stack([row[0], row[2]])))(ys)
        return jnp.concatenate([ys[:, 0:1], y2, ys[:, 2:3]], axis=1)

    # unscaled MAE on observed species (0, 2) (rober_crnn_qssa.jl:152-157)
    loss_fn = make_trajectory_loss("mae", i_obs=(0, 2))

    def loss_i_exp(params, i_exp, mask, unroll="scan"):
        pred = predict_from_u0(params, dataset.u0[i_exp], unroll)
        return loss_fn(pred, dataset.ys[i_exp], mask)

    def loss_i_exp_eval(params, i_exp, mask):
        return loss_i_exp(params, i_exp, mask, unroll="while")

    def loss_on_data(params, u0_i, ys_i, mask_i, unroll="scan"):
        # index-free loss for data-parallel sharding (parallel/dp_runner.py)
        return loss_fn(predict_from_u0(params, u0_i, unroll), ys_i, mask_i)

    lim = (6.0 / (cfg.ns + cfg.nr)) ** 0.5
    pcrnn = jax.random.uniform(k_p, (np_crnn,), dtype, -lim, lim).at[-1].set(0.1)
    trainer = Trainer(
        loss_i_exp=loss_i_exp,
        loss_i_exp_eval=loss_i_exp_eval,
        optimizer=adamw_like(cfg.lr, weight_decay=cfg.weight_decay),
        n_exp_train=cfg.n_exp_train,
        n_exp=cfg.n_exp,
        n_save=cfg.datasize,
        mode=cfg.mode,
    )

    setup = CaseSetup(
        name="robertson_qssa",
        trainer=trainer,
        init_params={"crnn": pcrnn, "mlp": mlp_params},
        predict=jax.jit(lambda p, i: predict_from_u0(p, dataset.u0[i])),
        weights_fn=weights_fn,
        dataset=dataset,
        logx_plots=True,
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
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel over N devices (-1 = all)")
    args = ap.parse_args()
    cfg = QSSAConfig(mode=args.mode)
    if args.lr is not None:
        cfg.lr = args.lr
    setup = build(cfg)
    run_case(setup, n_epoch=args.epochs, out_dir=args.out,
             restart=args.restart, dp=args.dp)

"""case1 rev: reversible-reaction CRNN (A<->B<->C<->D, 2C<->D+E).

TPU-native rebuild of "/root/reference/case1 rev/case1.jl": the ground
truth is a reversible mass-action network with all rate constants 1; the
CRNN proposes nr=10 reversible reactions whose forward and backward order
matrices both derive from a SHARED w_out (w_in_f = clamp(-w_out, 0, 2.5),
w_in_b = clamp(w_out, 0, 2.5)) under the equilibrium-constant-1 assumption
w_kb = w_kf (:72-78); RHS du = w_out @ (exp(f) - exp(b)) (:81-90).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from crnn_tpu.cases.base import CaseSetup, run_case
from crnn_tpu.data.generate import generate_dataset
from crnn_tpu.data.truth import REVERSIBLE_K, reversible_truth
from crnn_tpu.models.crnn import make_crnn_reversible_rhs
from crnn_tpu.ode import Tsit5, odesolve
from crnn_tpu.train.loop import Trainer
from crnn_tpu.train.loss import make_trajectory_loss
from crnn_tpu.train.optimizers import adamw_like
from crnn_tpu.transforms.p2vec import init_params_reversible, p2vec_reversible


@dataclass
class Case1RevConfig:
    # reference constants: case1 rev/case1.jl:14-35
    ns: int = 5
    nr: int = 10            # over-parameterised vs 4 true reversible pairs
    datasize: int = 100
    tstep: float = 0.1     # tspan [0, 10] (case1 rev/case1.jl:21-22) — round-1
                           # used 0.4 (t1=40), which parks 3/4 of every
                           # trajectory at equilibrium and was a main cause of
                           # the val ~0.65 plateau
    n_exp_train: int = 20
    n_exp_test: int = 10
    noise: float = 1e-3    # reference noise (case1 rev/case1.jl:25)
    lr: float = 1e-3       # reference: ADAMW 1e-4 x 20 sequential updates
                           # per epoch (:19); batch mode takes 1 full-batch
                           # step per epoch, so 1e-3 is the matched scale
    weight_decay: float = 1e-8
    atol: float = 1e-5
    rtol: float = 1e-2
    lb: float = 1e-5
    grad_max: float = 0.0
    seed: int = 1234
    max_steps: int = 512
    mode: str = "batch"
    dtype: str = "float32"
    # static 0/1 mask over the nr proposed reactions (None = all active):
    # a masked reaction's w_out column is zeroed, making it inert and
    # gradient-free — the leave-one-out model-reduction knob the reference
    # ReadMe prescribes for the over-parameterised ansatz
    # (robertson/ReadMe.md:7 'leave one out method'; same redundancy story
    # for the nr=10 reversible proposal here).
    reaction_mask: tuple = None

    @property
    def n_exp(self) -> int:
        return self.n_exp_train + self.n_exp_test


def build(cfg: Case1RevConfig = Case1RevConfig()) -> CaseSetup:
    dtype = jnp.dtype(cfg.dtype)
    key = jax.random.PRNGKey(cfg.seed)
    k_u0, k_noise, k_p = jax.random.split(key, 3)

    # u0 ~ U(0,1), first two species +0.2, others NOT zeroed (:47-49)
    u0 = jax.random.uniform(k_u0, (cfg.n_exp, cfg.ns), dtype)
    u0 = u0.at[:, :2].add(0.2)
    t1 = cfg.datasize * cfg.tstep
    saveat = jnp.linspace(0.0, t1, cfg.datasize, dtype=dtype)
    dataset = generate_dataset(
        k_noise, reversible_truth, Tsit5(), u0, REVERSIBLE_K.astype(dtype),
        0.0, t1, saveat, rtol=1e-6, atol=1e-8, noise=cfg.noise,
        scale_mode="max_min", scale_lb=cfg.lb,
    )

    rhs = make_crnn_reversible_rhs(cfg.lb)
    solver = Tsit5()

    if cfg.reaction_mask is not None:
        rmask = jnp.asarray(cfg.reaction_mask, dtype)

        def weights_fn(p):
            w = p2vec_reversible(p, cfg.ns, cfg.nr)
            return w._replace(w_out=w.w_out * rmask[None, :])
    else:
        def weights_fn(p):
            return p2vec_reversible(p, cfg.ns, cfg.nr)

    def predict_from_u0(p, u0_i, unroll="scan"):
        w = weights_fn(p)
        sol = odesolve(
            rhs, solver, u0_i, 0.0, t1, saveat, args=w,
            rtol=cfg.rtol, atol=cfg.atol, max_steps=cfg.max_steps,
            unroll=unroll,
        )
        return sol.ys

    loss_fn = make_trajectory_loss("mae", yscale=dataset.yscale)

    def loss_i_exp(p, i_exp, mask, unroll="scan"):
        pred = predict_from_u0(p, dataset.u0[i_exp], unroll)
        return loss_fn(pred, dataset.ys[i_exp], mask)

    def loss_i_exp_eval(p, i_exp, mask):
        return loss_i_exp(p, i_exp, mask, unroll="while")

    def loss_on_data(p, u0_i, ys_i, mask_i, unroll="scan"):
        # index-free loss for data-parallel sharding (parallel/dp_runner.py)
        return loss_fn(predict_from_u0(p, u0_i, unroll), ys_i, mask_i)

    trainer = Trainer(
        loss_i_exp=loss_i_exp,
        loss_i_exp_eval=loss_i_exp_eval,
        optimizer=adamw_like(cfg.lr, weight_decay=cfg.weight_decay,
                             grad_max=cfg.grad_max or None),
        n_exp_train=cfg.n_exp_train,
        n_exp=cfg.n_exp,
        n_save=cfg.datasize,
        mode=cfg.mode,
        # forward-mode AD through the while driver (the reference's
        # ForwardDiff path, case1 rev/case1.jl:197): the reversible RHS
        # develops extreme reverse-mode sensitivities mid-training (grad
        # norms ~1e11 and eventual NaNs through the deep scan); 60 forward
        # tangents are cheap and stable
        grad_mode="fwd",
    )

    return CaseSetup(
        name="case1_rev",
        trainer=trainer,
        init_params=init_params_reversible(k_p, cfg.ns, cfg.nr, dtype=dtype),
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
    ap.add_argument("--out", default="runs")
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel over N devices (-1 = all)")
    args = ap.parse_args()
    setup = build(Case1RevConfig(mode=args.mode))
    run_case(setup, n_epoch=args.epochs, out_dir=args.out,
             restart=args.restart, dp=args.dp)

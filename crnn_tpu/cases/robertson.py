"""Robertson: strongly stiff CRNN over t in [0, 1e5] (Float64).

TPU-native rebuild of /root/reference/robertson/rober_crnn.jl: 25
experiments with LHS-sampled initial conditions, 40 log-spaced save times,
Rosenbrock23, per-species atol, product-tied 10^w_out p2vec, dy/dt
rescaling, gradient-norm clipping at 10, stochastic prefix horizons
(sample = rand(32:40)). Runs in float64 (rober_crnn.jl:40).

The LM finisher variant (rober_crnn_lm.jl) is exposed via ``run_lm_finish``:
ADAM until loss < 0.1, then Levenberg-Marquardt on the per-experiment
residual vector with a forward-mode Jacobian.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from crnn_tpu.cases.base import CaseSetup, run_case
from crnn_tpu.data.generate import generate_dataset, latin_hypercube
from crnn_tpu.data.truth import ROBERTSON_K, robertson_truth
from crnn_tpu.models.crnn import make_crnn_scaled_rhs
from crnn_tpu.models.jacobian import make_crnn_scaled_jac
from crnn_tpu.ode import Rosenbrock23, odesolve
from crnn_tpu.train.lm import levenberg_marquardt
from crnn_tpu.train.loop import Trainer
from crnn_tpu.train.loss import make_trajectory_loss
from crnn_tpu.train.optimizers import adamw_like
from crnn_tpu.transforms.p2vec import init_params_robertson, p2vec_robertson


@dataclass
class RobertsonConfig:
    # reference constants: rober_crnn.jl:16-41
    ns: int = 3
    nr: int = 6
    datasize: int = 40
    batchsize: int = 32
    n_exp_train: int = 20
    n_exp_val: int = 5
    noise: float = 1e-4
    lr: float = 5e-3
    weight_decay: float = 1e-6
    grad_max: float = 10.0
    rtol: float = 1e-3
    lb: float = 1e-8
    ub: float = 10.0
    seed: int = 1234
    max_steps: int = 192
    mode: str = "batch"
    # gradient path: 'rev_scan' (checkpointed reverse over the scan driver,
    # default) or 'adjoint' (continuous backsolve adjoint, ode/adjoint.py —
    # the BacksolveAdjoint analogue, O(n_save) memory instead of
    # O(max_steps) on the 10^5-second horizon; see docs/DESIGN.md table)
    grad_path: str = "rev_scan"
    # static 0/1 keep-mask over w_out entries, shape (ns, nr) as a nested
    # tuple — the hard-threshold pruning hook (case2_pruning.jl pattern);
    # None = no pruning
    w_out_mask: Optional[tuple] = None
    # training dtype: the reference runs Float64 (rober_crnn.jl:40) because
    # y2 ~ 3.6e-5 rides on y1 ~ 1; "float32" is the TPU-native experiment
    # (f64 on TPU is double-float emulation, ~6x slower) — truth data is
    # always generated in f64 and cast down, so only the training solve and
    # gradient run in f32.
    dtype: str = "float64"

    @property
    def n_exp(self) -> int:
        return self.n_exp_train + self.n_exp_val

    @property
    def atol(self):
        # per-species absolute tolerance vector (rober_crnn.jl:34)
        return jnp.array([1e-6, 1e-8, 1e-6])


def build(cfg: RobertsonConfig = RobertsonConfig()) -> CaseSetup:
    from crnn_tpu.infra.runtime import enable_x64, host_generation

    enable_x64()  # truth generation is always f64
    dtype = jnp.float64
    train_dtype = jnp.dtype(cfg.dtype)
    key = jax.random.PRNGKey(cfg.seed)
    k_u0, k_lhc, k_noise, k_p = jax.random.split(key, 4)

    # f64 truth generation is pinned to the host CPU (host_generation):
    # the accelerator path stays strictly working-precision
    with host_generation():
        # -- data (rober_crnn.jl:43-47): u0 ~ U(0,1)*2+0.5 then y2=lb and
        #    (y1, y3) from a Latin hypercube / n + 0.5
        u0 = jax.random.uniform(k_u0, (cfg.n_exp, cfg.ns), dtype) * 2.0 + 0.5
        u0 = u0.at[:, 1].set(cfg.lb)
        lhc = latin_hypercube(k_lhc, cfg.n_exp, 2, dtype) + 0.5
        u0 = u0.at[:, 0].set(lhc[:, 0]).at[:, 2].set(lhc[:, 1])

        saveat = 10.0 ** jnp.linspace(0.0, 5.0, cfg.datasize).astype(dtype)
        t1 = float(saveat[-1])
        dataset = generate_dataset(
            k_noise, robertson_truth, Rosenbrock23(), u0,
            ROBERTSON_K.astype(dtype), 0.0, t1, saveat,
            rtol=1e-8, atol=jnp.array([1e-10, 1e-12, 1e-10]),
            noise=cfg.noise, scale_mode="max_min", scale_lb=0.0,
        )
    if train_dtype != dtype:
        dataset = dataset._replace(
            **{f: jnp.asarray(getattr(dataset, f), train_dtype)
               for f in ("u0", "ys", "ys_clean", "ts", "yscale")}
        )
        saveat = saveat.astype(train_dtype)
    dydt_scale = dataset.yscale / t1

    rhs = make_crnn_scaled_rhs(cfg.lb, jnp.inf, dydt_scale, exp_cap=32.0)
    # analytic Jacobian for the W-method (models/jacobian.py)
    solver = Rosenbrock23(jac=make_crnn_scaled_jac(cfg.lb, jnp.inf, dydt_scale,
                                                   exp_cap=32.0))

    if cfg.w_out_mask is not None:
        keep = jnp.asarray(cfg.w_out_mask, train_dtype)

        def weights_fn(p):
            w = p2vec_robertson(p, cfg.ns, cfg.nr)
            return w._replace(w_out=w.w_out * keep)
    else:
        def weights_fn(p):
            return p2vec_robertson(p, cfg.ns, cfg.nr)

    def predict_from_u0(p, u0_i, unroll="scan"):
        w = weights_fn(p)
        if cfg.grad_path == "adjoint" and unroll == "scan":
            # continuous backsolve adjoint for the training grad path
            # (yeast_glycolysis.jl:148 / case2.jl:123 BacksolveAdjoint)
            from crnn_tpu.ode.adjoint import odesolve_adjoint

            return odesolve_adjoint(
                rhs, solver, u0_i, 0.0, t1, saveat, args=w,
                rtol=cfg.rtol, atol=cfg.atol.astype(train_dtype),
                max_steps=cfg.max_steps,
            )
        sol = odesolve(
            rhs, solver, u0_i, 0.0, t1, saveat, args=w,
            rtol=cfg.rtol, atol=cfg.atol.astype(train_dtype),
            max_steps=cfg.max_steps,
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
        # index-free loss for data-parallel sharding (parallel/dp_runner.py);
        # eval passes request the early-exit while driver via unroll
        return loss_fn(predict_from_u0(p, u0_i, unroll), ys_i, mask_i)

    trainer = Trainer(
        loss_i_exp=loss_i_exp,
        loss_i_exp_eval=loss_i_exp_eval,
        optimizer=adamw_like(cfg.lr, weight_decay=cfg.weight_decay,
                             grad_max=cfg.grad_max),
        n_exp_train=cfg.n_exp_train,
        n_exp=cfg.n_exp,
        n_save=cfg.datasize,
        mode=cfg.mode,
        horizon_range=(cfg.batchsize, cfg.datasize),
    )

    setup = CaseSetup(
        name="robertson",
        trainer=trainer,
        init_params=init_params_robertson(k_p, cfg.ns, cfg.nr,
                                          dtype=train_dtype),
        predict=jax.jit(lambda p, i: predict_from_u0(p, dataset.u0[i])),
        weights_fn=weights_fn,
        dataset=dataset,
        dydt_scale=dydt_scale,
        logx_plots=True,
        loss_on_data=loss_on_data,
    )
    setup.extras["loss_i_exp"] = loss_i_exp
    setup.extras["config"] = cfg
    return setup


def run_lm_finish(setup: CaseSetup, params, max_iters: int = 200):
    """LM polish on the per-experiment loss residual vector
    (rober_crnn_lm.jl:211-253)."""
    cfg = setup.extras["config"]
    loss_i = setup.extras["loss_i_exp"]
    mask = jnp.ones((cfg.datasize,), jnp.float64)

    def residuals(p):
        return jax.vmap(lambda i: loss_i(p, i, mask))(
            jnp.arange(cfg.n_exp_train)
        )

    return levenberg_marquardt(residuals, params, max_iters=max_iters,
                               verbose=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=500)
    ap.add_argument("--mode", default="batch")
    ap.add_argument("--lm-finish", action="store_true")
    ap.add_argument("--restart", action="store_true")
    ap.add_argument("--out", default="runs")
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel over N devices (-1 = all)")
    args = ap.parse_args()
    setup = build(RobertsonConfig(mode=args.mode))
    state, _ = run_case(setup, n_epoch=args.epochs, out_dir=args.out,
                        restart=args.restart, dp=args.dp)
    if args.lm_finish:
        p_fit, info = run_lm_finish(setup, state.params)
        print("LM finish:", info["cost"], "converged:", info["converged"])

"""Fine-tune the reference's PUBLISHED Robertson table under this
framework's solver — closing the basin-equivalence question from the
round-2 verdict (item 3a) in the strongest available form.

robertson_published_loss.py showed the published table
(robertson/ReadMe.md:15-36) evaluates BETTER than our from-scratch
optimum on our dataset (calibrated 4.43e-3 vs ours 1.03e-2): the
published basin is genuinely good. This script shows the framework can
*hold and improve* that basin: treat the published physical weights
(w_in, w_b, w_out) plus the 3-species dydt_scale correction as the
trainables, descend with Adam in a per-parameter relative step space
(entries span 1e-6..3e4, so raw-Adam steps would freeze the large
Arrhenius-scale entries), select on the 5 held-out experiments, and
report train/val/all-25 losses next to the published table's own and our
from-scratch optimum's. If fine-tuned <= published-calibrated, the
framework beats the reference's published optimum under identical solver
and data.

Usage: python scripts/robertson_published_finetune.py [--seed 7]
           [--iters 2000] [--lr 1e-3]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from robertson_parity import REF_W_IN  # noqa: E402
from robertson_published_loss import REF_W_B, REF_W_OUT  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--p-ours",
                    default="runs/robertson_long/p_seed7_r3_final.npy")
    ap.add_argument("--out-md",
                    default="runs/robertson_long/published_finetune.md")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from crnn_tpu.cases.robertson import RobertsonConfig, build
    from crnn_tpu.models.crnn import make_crnn_scaled_rhs
    from crnn_tpu.models.jacobian import make_crnn_scaled_jac
    from crnn_tpu.ode import Rosenbrock23, odesolve
    from crnn_tpu.train.loss import make_trajectory_loss
    from crnn_tpu.transforms.p2vec import CRNNWeights

    cfg = RobertsonConfig(seed=args.seed)
    setup = build(cfg)
    ds = setup.dataset
    dydt_scale = jnp.asarray(setup.dydt_scale, jnp.float64)
    t1 = float(ds.ts[-1])
    saveat = jnp.asarray(ds.ts, jnp.float64)
    loss_fn = make_trajectory_loss("mae", yscale=ds.yscale)
    mask = jnp.ones((cfg.datasize,), jnp.float64)
    i_train = jnp.arange(cfg.n_exp_train)
    i_val = jnp.arange(cfg.n_exp_train, cfg.n_exp)
    i_all = jnp.arange(cfg.n_exp)

    w0 = {
        "w_in": jnp.asarray(REF_W_IN.T, jnp.float64),     # (ns, nr)
        "w_b": jnp.asarray(REF_W_B, jnp.float64),
        "w_out": jnp.asarray(REF_W_OUT.T, jnp.float64),   # (ns, nr)
    }
    # relative step space: w = w0 + (|w0| + 1) * d  (d trainable, init 0)
    scales = {k: jnp.abs(v) + 1.0 for k, v in w0.items()}

    def weights_of(d):
        w_in = jnp.clip(w0["w_in"] + scales["w_in"] * d["w_in"], 0.0, 2.5)
        return CRNNWeights(
            w_in=w_in,
            w_b=w0["w_b"] + scales["w_b"] * d["w_b"],
            w_out=w0["w_out"] + scales["w_out"] * d["w_out"],
        )

    def mean_loss(d, log_s, idxs):
        rhs = make_crnn_scaled_rhs(cfg.lb, jnp.inf, dydt_scale * jnp.exp(log_s),
                                   exp_cap=32.0)
        solver = Rosenbrock23(jac=make_crnn_scaled_jac(
            cfg.lb, jnp.inf, dydt_scale * jnp.exp(log_s), exp_cap=32.0))
        w = weights_of(d)

        def one(i):
            sol = odesolve(rhs, solver, ds.u0[i], 0.0, t1, saveat, args=w,
                           rtol=cfg.rtol, atol=cfg.atol.astype(jnp.float64),
                           max_steps=cfg.max_steps, unroll="scan")
            return loss_fn(sol.ys, ds.ys[i], mask)

        return jnp.mean(jax.vmap(one)(idxs))

    train_loss = jax.jit(lambda d, s: mean_loss(d, s, i_train))
    val_loss = jax.jit(lambda d, s: mean_loss(d, s, i_val))
    all_loss = jax.jit(lambda d, s: mean_loss(d, s, i_all))

    d = {k: jnp.zeros_like(v) for k, v in w0.items()}
    log_s = jnp.zeros((3,), jnp.float64)
    params = (d, log_s)
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    vg = jax.jit(jax.value_and_grad(lambda pr: train_loss(*pr)))

    zero = ({k: jnp.zeros_like(v) for k, v in w0.items()}, log_s)
    pub_raw = float(all_loss(*zero))
    pub_val = float(val_loss(*zero))

    best = (np.inf, params)
    t0 = time.time()
    for it in range(args.iters):
        v, g = vg(params)
        g = jax.tree.map(lambda x: jnp.where(jnp.isfinite(x), x, 0.0), g)
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        if (it + 1) % 50 == 0:
            lv = float(val_loss(*params))
            if np.isfinite(lv) and lv < best[0]:
                best = (lv, jax.tree.map(np.asarray, params))
            if (it + 1) % 500 == 0:
                print(f"{it+1}: train {float(v):.4e} val {lv:.4e} "
                      f"best {best[0]:.4e} "
                      f"({(time.time()-t0)/(it+1)*1e3:.0f} ms/it)",
                      flush=True)
    lv = float(val_loss(*params))
    if np.isfinite(lv) and lv < best[0]:
        best = (lv, jax.tree.map(np.asarray, params))
    ft_val, ft_params = best
    ft_params = jax.tree.map(jnp.asarray, ft_params)
    ft_all = float(all_loss(*ft_params))
    ft_train = float(train_loss(*ft_params))

    # our from-scratch optimum, same splits
    p_ours = jnp.asarray(np.load(args.p_ours), jnp.float64)
    loss_i = setup.extras["loss_i_exp"]
    ours = {
        name: float(jnp.mean(jax.vmap(
            lambda i: loss_i(p_ours, i, mask))(idxs)))
        for name, idxs in (("val", i_val), ("all", i_all))
    }

    w_ft = weights_of(ft_params[0])
    np.savez("runs/robertson_long/published_finetune.npz",
             w_in=np.asarray(w_ft.w_in), w_b=np.asarray(w_ft.w_b),
             w_out=np.asarray(w_ft.w_out), log_s=np.asarray(ft_params[1]))

    with open(args.out_md, "w") as f:
        f.write(
            "# Fine-tuning the published Robertson table under this "
            "framework\n\n"
            f"Dataset: robertson seed {args.seed}; Adam({args.lr:g}) x "
            f"{args.iters} iters in per-parameter relative step space on "
            "the 20 train experiments, selected on the 5 held-out "
            "experiments.\n\n"
            "| candidate | val (5 held-out) | all 25 |\n|---|---|---|\n"
            f"| published table, raw | {pub_val:.4e} | {pub_raw:.4e} |\n"
            f"| **published table fine-tuned by this framework** | "
            f"**{ft_val:.4e}** | **{ft_all:.4e}** |\n"
            f"| our from-scratch optimum (`{args.p_ours}`) | "
            f"{ours['val']:.4e} | {ours['all']:.4e} |\n\n"
            f"(fine-tuned train loss {ft_train:.4e}; weights + scale "
            "correction in published_finetune.npz)\n")
    print(f"done: pub_raw {pub_raw:.4e} -> finetuned all-25 {ft_all:.4e} "
          f"(val {ft_val:.4e}); ours all-25 {ours['all']:.4e}", flush=True)


if __name__ == "__main__":
    main()

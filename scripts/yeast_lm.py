"""LM polish on the yeast hybrid (MLP-in-RHS) — round-5 VERDICT item 5.

The round-4 yeast run plateaued at val MAE ~9.4e-2 under Adam (train
7.4e-2 at the end of a 2e-3-decaying 4k-epoch extension). The reference's
own finisher for hard plateaus is Levenberg-Marquardt
(robertson/rober_crnn_lm.jl:211-253), which this framework ships
(train/lm.py) but had only ever applied to pure-CRNN param vectors. Here
the FULL hybrid parameter pytree — CRNN p2vec vector + the 3x5-unit MLP
that infers the 5 hidden species inside the RHS (yeast_glycolysis.jl:
128-136) — is ravelled into one flat vector (jax.flatten_util) and
polished against per-timepoint scaled residuals, i.e. true Gauss-Newton
on the trajectory MSE rather than the 20-entry per-experiment loss
residual the robertson finisher uses: with a few hundred parameters the normal
equations want the better-conditioned tall residual.

Solver budget note: residuals integrate with max_steps=1024 scan unroll —
the 384-step default exhausts at t~3.8/5.0 on the trained RHS and
zero-fills the tail (runs/yeast/fit.md root cause), which would poison
J^T J exactly like it poisoned Adam gradients.

Usage: python scripts/yeast_lm.py [--iters 100] [--out runs/yeast]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--params", default="runs/yeast/p_opt.npz")
    ap.add_argument("--out", default="runs/yeast")
    ap.add_argument("--max-steps", type=int, default=1024)
    ap.add_argument("--residuals", choices=["point", "exp"], default="point")
    ap.add_argument("--mlp-width", type=int, default=0,
                    help="hidden width of the 7->5 MLP (0 = reference 5); "
                         "must match the params being polished")
    ap.add_argument("--label", default="round-4 best",
                    help="row label for the pre-LM stage in lm_polish.md")
    ap.add_argument("--doc", default="lm_polish.md")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.flatten_util import ravel_pytree

    from crnn_tpu.cases.yeast import YeastConfig, build
    from crnn_tpu.models.crnn import make_crnn_yeast_rhs
    from crnn_tpu.ode import get_solver, odesolve
    from crnn_tpu.train.lm import levenberg_marquardt
    from crnn_tpu.transforms.p2vec import p2vec_yeast

    cfg = YeastConfig(max_steps=args.max_steps, mlp_width=args.mlp_width)
    setup = build(cfg)
    ds = setup.dataset

    # p_opt.npz holds the params pytree leaves in tree order (run_case save)
    loaded = np.load(args.params)
    leaves = [jnp.asarray(loaded[k]) for k in loaded.files]
    treedef = jax.tree_util.tree_structure(setup.init_params)
    params0 = jax.tree_util.tree_unflatten(treedef, leaves)
    p0_flat, unravel = ravel_pytree(params0)
    print(f"flat param count: {p0_flat.shape[0]}", flush=True)

    mask_all = jnp.ones((cfg.ntotal,), jnp.float32)
    loss_eval = jax.jit(jax.vmap(
        lambda prm, i: setup.trainer.loss_i_exp(prm, i, mask_all),
        in_axes=(None, 0)))

    def report(tagname, params):
        losses = np.asarray(loss_eval(params, jnp.arange(cfg.n_exp)))
        lt = float(losses[:cfg.n_exp_train].mean())
        lv = float(losses[cfg.n_exp_train:].mean())
        print(f"{tagname}: train MAE {lt:.4e} val MAE {lv:.4e}", flush=True)
        return lt, lv

    lt0, lv0 = report("pre-LM", params0)

    ys_train = jnp.clip(ds.ys[:cfg.n_exp_train], cfg.lb, cfg.ub)
    u0_train = ds.u0[:cfg.n_exp_train]
    yscale = ds.yscale
    n_pts = cfg.n_exp_train * cfg.ntotal * cfg.ns

    rhs = make_crnn_yeast_rhs(cfg.lb, cfg.ub, cfg.ns,
                              setup.extras["mlp_apply"])
    solver = get_solver(cfg.solver)
    t1 = float(cfg.ntotal * cfg.tstep)
    saveat = jnp.linspace(0.0, t1, cfg.ntotal, dtype=jnp.float32)

    def residuals(p_flat):
        params = unravel(p_flat)

        def one(u0_i, ys_i):
            w = p2vec_yeast(params["crnn"], cfg.ns, cfg.ns_, cfg.nr)
            sol = odesolve(
                rhs, solver, u0_i, 0.0, t1, saveat,
                args=(w, params["mlp"]), rtol=cfg.rtol,
                atol=cfg.atol, max_steps=cfg.max_steps, unroll="scan")
            pred = jnp.clip(sol.ys, cfg.lb, cfg.ub)
            return ((pred - ys_i) / yscale).reshape(-1)

        if args.residuals == "exp":
            return jax.vmap(lambda i: setup.trainer.loss_i_exp(
                params, i, mask_all))(jnp.arange(cfg.n_exp_train))
        r = jax.vmap(one)(u0_train, ys_train).reshape(-1)
        return r / np.sqrt(n_pts)   # cost ~ 0.5 * scaled-MSE

    t0 = time.time()
    p_lm, info = levenberg_marquardt(residuals, p0_flat,
                                     max_iters=args.iters, verbose=True)
    print(f"LM done in {time.time()-t0:.0f}s: converged={info['converged']} "
          f"cost {info['history'][0]:.4e} -> {info['cost']:.4e} "
          f"({len(info['history'])} accepted steps)", flush=True)

    params_lm = unravel(p_lm)
    lt1, lv1 = report("post-LM", params_lm)

    if lv1 < lv0:
        np.savez(os.path.join(args.out, "p_opt_lm.npz"),
                 *jax.tree_util.tree_leaves(params_lm))
        print(f"saved improved params -> {args.out}/p_opt_lm.npz", flush=True)

    with open(os.path.join(args.out, args.doc), "w") as f:
        f.write("# Yeast hybrid LM polish (round 5)\n\n")
        f.write("LM finisher (train/lm.py, rober_crnn_lm.jl analogue) on "
                f"the MLP-in-RHS hybrid: the full {p0_flat.size}-param "
                "pytree (CRNN p2vec + hidden-species MLP, width "
                f"{args.mlp_width or 5}) ravelled to one vector, "
                "per-timepoint scaled residuals "
                f"({args.residuals} mode), max_steps={args.max_steps}.\n\n")
        f.write("| stage | train MAE | val MAE |\n|---|---|---|\n")
        f.write(f"| Adam plateau ({args.label}) | {lt0:.4e} | {lv0:.4e} |\n")
        f.write(f"| + LM polish ({len(info['history'])} accepted steps, "
                f"{args.iters} max) | {lt1:.4e} | {lv1:.4e} |\n\n")
        verdict = ("val improved" if lv1 < lv0 else
                   "no val improvement — plateau is not a local-polish "
                   "artifact; supports a capacity/identifiability floor")
        f.write(f"**{verdict}** (cost {info['history'][0]:.4e} -> "
                f"{info['cost']:.4e}, converged={info['converged']}).\n")
    print("wrote lm_polish.md", flush=True)


if __name__ == "__main__":
    main()

"""TPU-scale yeast-glycolysis basin hunt: vmapped multi-restart sweep.

Round-4 VERDICT item 5 asked for yeast val < 5e-2 or a proven floor; the
round-5 LM polish broke the Adam plateau (9.48e-2 -> 8.45e-2) but the
champion is still a SINGLE init lineage. The robertson and GRN hunts both
showed single-init pessimism at this scale: population search over the
init distribution (vmapped through one jit, f32 working precision) found
basins 2-4x deeper than any serial-era lineage. This applies the same
recipe to the hybrid MLP-in-RHS case (yeast_glycolysis.jl:128-142
analogue, crnn_tpu/cases/yeast.py): R restarts of the FULL hybrid pytree
(CRNN p2vec + observed->hidden MLP) train simultaneously, staged-lr
AdamW on the 20 training experiments with the reference's stochastic
prefix horizons (batch = rand(32:300), yeast_glycolysis.jl:26+160), and
are judged full-horizon on the 10 held-out experiments.

Solver-budget note (runs/yeast/fit.md root cause): the learned RHS
stiffens mid-training and a 384-step budget exhausts at t~3.8/5.0,
zero-filling the tail and poisoning full-horizon loss AND gradients —
the hunt defaults to --max-steps 768.

Capacity arm: --mlp-width widens the three hidden MLP layers (reference
structure is width 5 = ns_ - ns); the round-5 capacity question is
whether the 8.45e-2 champion is capacity-limited or basin-limited.

Usage: python scripts/yeast_restarts.py [--restarts 64]
           [--stages 5e-3:2000,1e-3:2000,3e-4:1000] [--mlp-width 0]
           [--probe]   # time one step and exit
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--restarts", type=int, default=64)
    ap.add_argument("--stages", default="5e-3:2000,1e-3:2000,3e-4:1000")
    ap.add_argument("--base-seed", type=int, default=71)
    ap.add_argument("--max-steps", type=int, default=768)
    ap.add_argument("--mlp-width", type=int, default=0)
    ap.add_argument("--out", default="runs/yeast_hunt")
    ap.add_argument("--tag", default=None)
    ap.add_argument("--init-from", default=None,
                    help="hunt_p_<tag>.npz of stacked param pytrees to "
                         "continue from instead of fresh inits")
    ap.add_argument("--eval-every", type=int, default=100)
    ap.add_argument("--probe", action="store_true",
                    help="compile + time one train step and one eval "
                         "pass, print, and exit (no artifacts)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from crnn_tpu.cases.yeast import YeastConfig, build
    from crnn_tpu.models.mlp import mlp_init
    from crnn_tpu.transforms.p2vec import init_params_yeast

    cfg = YeastConfig(max_steps=args.max_steps, mlp_width=args.mlp_width)
    setup = build(cfg)
    loss_i = setup.trainer.loss_i_exp
    R = args.restarts
    dtype = jnp.dtype(cfg.dtype)

    node = cfg.ns_ - cfg.ns
    width = cfg.mlp_width or node
    sizes = [cfg.ns, width, width, width, node]
    acts = ["gelu", "gelu", "gelu", "softplus"]

    def init_one(key):
        k1, k2 = jax.random.split(key)
        mlp_params, _ = mlp_init(k2, sizes, acts, dtype)
        return {
            "crnn": init_params_yeast(k1, cfg.ns, cfg.ns_, cfg.nr,
                                      dtype=dtype),
            "mlp": mlp_params,
        }

    if args.init_from:
        loaded = np.load(args.init_from)
        leaves = [jnp.asarray(loaded[k]) for k in loaded.files]
        treedef = jax.tree_util.tree_structure(setup.init_params)
        ps = jax.tree_util.tree_unflatten(treedef, leaves)
        R = jax.tree_util.tree_leaves(ps)[0].shape[0]
        print(f"continuing {R} restarts from {args.init_from}", flush=True)
    else:
        keys = jax.random.split(jax.random.PRNGKey(args.base_seed), R)
        ps = jax.vmap(init_one)(keys)

    n_flat = sum(int(np.prod(l.shape[1:]))
                 for l in jax.tree_util.tree_leaves(ps))
    print(f"{R} restarts x {n_flat} params (mlp width {width}), "
          f"max_steps {cfg.max_steps}", flush=True)

    train_ids = jnp.arange(cfg.n_exp_train)
    val_ids = jnp.arange(cfg.n_exp_train, cfg.n_exp)
    mask_all = jnp.ones((cfg.ntotal,), jnp.float32)
    timepts = jnp.arange(cfg.ntotal, dtype=jnp.float32)

    def data_loss(p, mask):
        return jnp.mean(jax.vmap(lambda i: loss_i(p, i, mask))(train_ids))

    def val_loss(p):
        return jnp.mean(jax.vmap(lambda i: loss_i(p, i, mask_all))(val_ids))

    val_all = jax.jit(jax.vmap(val_loss))

    stages = [(float(s.split(":")[0]), int(s.split(":")[1]))
              for s in args.stages.split(",")]

    best_val = np.full((R,), np.inf)
    # np.array (copy): np.asarray of a jax array is a read-only view and
    # the best-carry writes into these leaves in place
    best_p = jax.tree_util.tree_map(lambda l: np.array(l), ps)
    os.makedirs(args.out, exist_ok=True)
    tag = args.tag or f"r{R}_seed{args.base_seed}_w{width}"

    def snapshot():
        np.savez(os.path.join(args.out, f"hunt_p_{tag}.npz"),
                 *jax.tree_util.tree_leaves(best_p))
        np.save(os.path.join(args.out, f"hunt_val_{tag}.npy"), best_val)

    horizon_key = np.random.default_rng(args.base_seed)

    for lr, n_epochs in stages:
        opt = optax.chain(optax.clip_by_global_norm(1.0),
                          optax.adamw(lr, weight_decay=1e-6))

        def one(p, opt_state, mask):
            _, g = jax.value_and_grad(data_loss)(p, mask)
            g = jax.tree_util.tree_map(
                lambda x: jnp.where(jnp.isfinite(x), x, 0.0), g)
            updates, opt_state = opt.update(g, opt_state, p)
            return optax.apply_updates(p, updates), opt_state

        step = jax.jit(jax.vmap(one, in_axes=(0, 0, None)))
        opt_states = jax.vmap(opt.init)(ps)

        if args.probe:
            mask = (timepts < 300).astype(jnp.float32)
            t0 = time.time()
            ps2, _ = step(ps, opt_states, mask)
            jax.block_until_ready(ps2)
            print(f"probe: first step (compile) {time.time()-t0:.1f}s",
                  flush=True)
            t0 = time.time()
            for _ in range(5):
                ps2, opt_states = step(ps2, opt_states, mask)
            jax.block_until_ready(ps2)
            print(f"probe: train step {(time.time()-t0)/5*1e3:.0f} ms "
                  f"(R={R})", flush=True)
            t0 = time.time()
            lv = np.asarray(val_all(ps2))
            print(f"probe: val pass {(time.time()-t0)*1e3:.0f} ms "
                  f"(first, incl compile)", flush=True)
            t0 = time.time()
            lv = np.asarray(val_all(ps2))
            print(f"probe: val pass {(time.time()-t0)*1e3:.0f} ms", flush=True)
            return

        t0 = time.time()
        for e in range(n_epochs):
            # reference stochastic horizon: batch = rand(32:300)
            h = int(horizon_key.integers(cfg.batch_min, cfg.ntotal + 1))
            mask = (timepts < h).astype(jnp.float32)
            ps, opt_states = step(ps, opt_states, mask)
            if (e + 1) % args.eval_every == 0:
                lv = np.asarray(val_all(ps))
                better = np.isfinite(lv) & (lv < best_val)
                if better.any():
                    pn = jax.tree_util.tree_map(np.asarray, ps)
                    best_val = np.where(better, lv, best_val)
                    for leaf_b, leaf_n in zip(
                            jax.tree_util.tree_leaves(best_p),
                            jax.tree_util.tree_leaves(pn)):
                        leaf_b[better] = leaf_n[better]
                if (e + 1) % (args.eval_every * 5) == 0 or e + 1 == args.eval_every:
                    dt = (time.time() - t0) / (e + 1)
                    print(f"[lr={lr:g}] {e+1}/{n_epochs} "
                          f"({dt*1e3:.0f} ms/ep) val min "
                          f"{np.nanmin(lv):.4e} med {np.nanmedian(lv):.4e} "
                          f"best {best_val.min():.4e}", flush=True)
                    snapshot()
        ps = jax.tree_util.tree_map(jnp.asarray, best_p)
        snapshot()
        print(f"[lr={lr:g}] stage done {time.time()-t0:.0f}s; "
              f"best val {best_val.min():.4e}", flush=True)

    # ---- report + champion artifacts ----
    order = np.argsort(best_val)
    champ = int(order[0])
    champ_p = jax.tree_util.tree_map(lambda l: l[champ], best_p)
    np.savez(os.path.join(args.out, f"p_best_{tag}.npz"),
             *jax.tree_util.tree_leaves(champ_p))

    # champion train loss for the gap diagnosis
    lt = float(jax.jit(lambda p: data_loss(p, mask_all))(
        jax.tree_util.tree_map(jnp.asarray, champ_p)))

    finite = best_val[np.isfinite(best_val)]
    md = os.path.join(args.out, f"hunt_{tag}.md")
    with open(md, "w") as f:
        f.write(f"# Yeast hybrid basin hunt ({R} vmapped restarts, "
                f"stages {args.stages}, seed {args.base_seed}, "
                f"mlp width {width}, max_steps {cfg.max_steps})\n\n")
        f.write("Population search over the hybrid init distribution "
                "(CRNN p2vec + observed->hidden MLP both re-drawn per "
                "restart); stochastic prefix horizons as in the "
                "reference (rand(32:300)); judged full-horizon on the "
                "10 held-out experiments. Single-lineage references: "
                "round-4 Adam champion val 9.48e-2, round-5 LM polish "
                "8.45e-2.\n\n")
        f.write("## Final-val spectrum\n\n")
        if finite.size:
            qs = np.percentile(finite, [0, 10, 25, 50, 75, 90, 100])
            f.write("| min | p10 | p25 | median | p75 | p90 | max |\n")
            f.write("|---|---|---|---|---|---|---|\n")
            f.write("| " + " | ".join(f"{q:.3e}" for q in qs) + " |\n\n")
        f.write(f"{int(np.isfinite(best_val).sum())}/{R} restarts finite.\n\n")
        f.write("## Top 8\n\n| restart | best val |\n|---|---|\n")
        for r in order[:8]:
            f.write(f"| {int(r)} | {best_val[r]:.4e} |\n")
        f.write(f"\n**Champion: restart {champ}, val "
                f"{best_val[champ]:.4e}, train (full-horizon) "
                f"{lt:.4e}.** Artifacts: p_best_{tag}.npz "
                f"(leaves in init_params tree order — yeast_lm.py "
                f"--params compatible).\n")
    print(f"hunt done -> {md}; champion val {best_val[champ]:.4e} "
          f"train {lt:.4e}", flush=True)


if __name__ == "__main__":
    main()

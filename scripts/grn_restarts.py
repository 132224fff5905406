"""TPU-scale GRN basin hunt: vmapped 256-restart sweep + recovery census.

Round-4 closed the GRN 15th-reaction thread with a truth-init control
(15/15 representable, val 2.89e-2, stable) + a 41-point barrier scan:
the learned 14/15 and the truth sit in genuinely separate basins and
random init lands in the wrong one. What the round-4 VERDICT (item 4)
demanded is the QUANTIFIED attraction-measure: at TPU scale (256+
restarts vmapped through one jit, not 8 serial-era ones), what fraction
of the init distribution reaches 15/15 at all?

Every restart draws from the case's own Xavier init
(gene-regulatory.jl:34-36 analogue, transforms/p2vec.py), trains the
full-horizon log-MAE loss staged-lr, and is judged on the 30 held-out
experiments. The champion and top-K get the joint-signature mechanism
census (scripts/grn_recovery.py machinery) so the hunt reports not just
a val histogram but a per-basin reaction count: how many inits find
14/15, how many find 15/15, how many stall lower.

Usage: python scripts/grn_restarts.py [--restarts 256]
           [--stages 1e-3:6000,3e-4:4000,1e-4:3000] [--census-top 16]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from grn_recovery import signature, true_reactions


def match_count(p, setup):
    """Number of the 15 true reactions recovered at params p
    (joint-signature cos > 0.9, merged-channel crediting) —
    the same census scripts/grn_recovery.py writes to markdown."""
    import jax.numpy as jnp

    w = setup.weights_fn(jnp.asarray(p))
    w_out = np.asarray(w.w_out)
    w_in = np.asarray(w.w_in).T
    dydt = np.asarray(setup.dydt_scale).reshape(-1, 1)
    scale = (w_out * dydt).T
    norm = scale / (np.abs(scale).max(axis=1, keepdims=True) + 1e-30)
    rxns, merged = true_reactions()
    candidates = [(signature(v, o), (i,)) for i, (_, v, o) in enumerate(rxns)]
    candidates += [(signature(v, o), credit) for _, v, o, credit in merged]
    matched = set()
    for j in range(norm.shape[0]):
        sig = signature(norm[j], w_in[j])
        cos = np.array([sig @ c / (np.linalg.norm(sig) *
                                   np.linalg.norm(c) + 1e-30)
                        for c, _ in candidates])
        i = int(np.argmax(cos))
        if cos[i] > 0.9:
            matched.update(candidates[i][1])
    return len(matched)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--restarts", type=int, default=256)
    ap.add_argument("--stages", default="1e-3:6000,3e-4:4000,1e-4:3000")
    ap.add_argument("--base-seed", type=int, default=31)
    ap.add_argument("--census-top", type=int, default=16)
    ap.add_argument("--out", default="runs/grn_hunt")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from crnn_tpu.cases.case3 import build, grn_config
    from crnn_tpu.transforms.p2vec import init_params_case3

    cfg = grn_config()
    setup = build(cfg)
    loss_i = setup.trainer.loss_i_exp
    mask_all = jnp.ones((cfg.datasize,), jnp.float32)
    R = args.restarts

    keys = jax.random.split(jax.random.PRNGKey(args.base_seed), R)
    ps = jax.vmap(lambda k: init_params_case3(k, cfg.ns, cfg.nr))(keys)

    def mean_loss(p, lo, hi):
        return jnp.mean(jax.vmap(lambda i: loss_i(p, i, mask_all))(
            jnp.arange(lo, hi)))

    def data_loss(p):
        return mean_loss(p, 0, cfg.n_exp_train)

    def val_loss(p):
        return mean_loss(p, cfg.n_exp_train, cfg.n_exp)

    val_all = jax.jit(jax.vmap(val_loss))

    stages = [(float(s.split(":")[0]), int(s.split(":")[1]))
              for s in args.stages.split(",")]

    best_val = np.full((R,), np.inf)
    best_p = np.array(ps)
    os.makedirs(args.out, exist_ok=True)
    tag = f"r{R}_seed{args.base_seed}"

    def snapshot():
        np.save(os.path.join(args.out, f"hunt_p_{tag}.npy"), best_p)
        np.save(os.path.join(args.out, f"hunt_val_{tag}.npy"), best_val)

    for lr, n_epochs in stages:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_max),
                          optax.adamw(lr, weight_decay=1e-6))

        def one(p, opt_state):
            _, g = jax.value_and_grad(data_loss)(p)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            updates, opt_state = opt.update(g, opt_state, p)
            return optax.apply_updates(p, updates), opt_state

        step = jax.jit(jax.vmap(one))
        opt_states = jax.vmap(opt.init)(ps)
        t0 = time.time()
        for e in range(n_epochs):
            ps, opt_states = step(ps, opt_states)
            if (e + 1) % 100 == 0:
                lv = np.asarray(val_all(ps))
                better = np.isfinite(lv) & (lv < best_val)
                if better.any():
                    pn = np.asarray(ps)
                    best_val = np.where(better, lv, best_val)
                    best_p[better] = pn[better]
                if (e + 1) % 1000 == 0 or e + 1 == 100:
                    dt = (time.time() - t0) / (e + 1)
                    print(f"[lr={lr:g}] {e+1}/{n_epochs} "
                          f"({dt*1e3:.0f} ms/ep) val min "
                          f"{np.nanmin(lv):.4e} med {np.nanmedian(lv):.4e} "
                          f"best {best_val.min():.4e}", flush=True)
                    snapshot()
        ps = jnp.asarray(best_p)
        snapshot()
        print(f"[lr={lr:g}] stage done {time.time()-t0:.0f}s; "
              f"best val {best_val.min():.4e}", flush=True)

    # ---- census: mechanism recovery across the whole top-K ----
    order = np.argsort(best_val)
    rows = []
    for r in order[:args.census_top]:
        n = match_count(best_p[r], setup)
        rows.append((int(r), float(best_val[r]), n))
        print(f"restart {r}: val {best_val[r]:.4e} -> {n}/15", flush=True)
    counts = np.array([n for _, _, n in rows])
    champ = rows[0]
    np.save(os.path.join(args.out, "p_best.npy"), best_p[order[0]])

    finite = best_val[np.isfinite(best_val)]
    md = os.path.join(args.out, f"hunt_{tag}.md")
    with open(md, "w") as f:
        f.write(f"# GRN attraction-measure hunt ({R} vmapped restarts, "
                f"stages {args.stages}, seed {args.base_seed})\n\n")
        f.write("Quantifies the round-4 barrier-scan finding: the 15/15 "
                "truth basin exists (truth-init control val 2.89e-2) but "
                "random init may never land in it. Every restart drawn "
                "fresh from the case init (gene-regulatory.jl:34-36 "
                "analogue); full-horizon log-MAE, judged on the 30 "
                "held-out experiments.\n\n")
        f.write("## Final-val spectrum (all restarts)\n\n")
        qs = np.percentile(finite, [0, 10, 25, 50, 75, 90, 100])
        f.write("| min | p10 | p25 | median | p75 | p90 | max |\n")
        f.write("|---|---|---|---|---|---|---|\n")
        f.write("| " + " | ".join(f"{q:.3e}" for q in qs) + " |\n\n")
        edges = [0, 4e-2, 6e-2, 1e-1, 3e-1, np.inf]
        f.write("| val bin | restarts |\n|---|---|\n")
        for lo, hi in zip(edges[:-1], edges[1:]):
            c = int(((finite >= lo) & (finite < hi)).sum())
            f.write(f"| [{lo:g}, {hi:g}) | {c} |\n")
        f.write(f"\n## Mechanism census (top {args.census_top})\n\n")
        f.write("| restart | val | reactions recovered |\n|---|---|---|\n")
        for r, v, n in rows:
            f.write(f"| {r} | {v:.4e} | {n}/15 |\n")
        frac15 = float((counts == 15).mean())
        f.write(f"\n**Champion: restart {champ[0]}, val {champ[1]:.4e}, "
                f"{champ[2]}/15 reactions.** Of the top "
                f"{args.census_top} basins, {int((counts == 15).sum())} "
                f"reach 15/15 ({frac15:.0%}), "
                f"{int((counts == 14).sum())} reach 14/15. Truth-init "
                f"control reference: val 2.89e-2 at 15/15; round-4 "
                f"learned champion: val 3.63e-2 at 14/15.\n")
    print(f"census done -> {md}", flush=True)
    # full markdown recovery table for the champion
    os.system(f"{sys.executable} scripts/grn_recovery.py "
              f"{os.path.join(args.out, 'p_best.npy')} {args.out}")


if __name__ == "__main__":
    main()

"""GRN channel surgery: re-draw ONLY the contaminated reaction columns.

runs/grn/p_best.npy recovers 14/15 true reactions (val 3.63e-2); the
missing DNA_C -> DNA_C + mRNA_C transcription is smeared across four
contaminated learned columns (r3/r8/r14/r15 in mechanism_recovery.md,
cos 0.62-0.80 with A/C cross-terms). Two whole-vector polish attacks
(low-lr continuation, cold polish) failed to disentangle them: every
parameter moves together, so the 11 clean channels anchor the bad basin.

This attack is coordinate-descent across basins: keep the 11 clean
columns, re-draw the 4 contaminated columns (w_b entry + w_out_raw and
w_in column slices) from the case's own Xavier init
(gene-regulatory.jl:34-36 analogue), and retrain R restarts vmapped —
stage 1 optionally updates ONLY the re-drawn columns (clean channels
frozen via gradient mask), later stages release everything at low lr so
the ensemble can re-balance without destroying the recovered structure.

Usage: python scripts/grn_surgery.py [--restarts 8]
           [--cols 2,7,13,14] [--stages f1e-3:2000,3e-4:2000,1e-4:2000]
           (stage prefix 'f' = clean columns frozen for that stage)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--restarts", type=int, default=8)
    ap.add_argument("--cols", default="2,7,13,14",
                    help="0-based contaminated reaction columns to re-draw")
    ap.add_argument("--stages", default="f1e-3:2000,3e-4:2000,1e-4:2000")
    ap.add_argument("--base-seed", type=int, default=5)
    ap.add_argument("--p", default="runs/grn/p_best.npy")
    ap.add_argument("--out", default="runs/grn_surgery")
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
    ns, nr = cfg.ns, cfg.nr
    cols = np.array([int(c) for c in args.cols.split(",")])

    # param layout (p2vec_case3): [w_b nr][w_out_raw ns*nr][w_in ns*nr][slope]
    idx = [cols]
    for block in (1, 1 + ns):   # w_out_raw rows, then w_in rows
        for s in range(ns):
            idx.append((block + s) * nr + cols)
    idx = np.concatenate([np.asarray(i) for i in idx])
    surgery_mask = np.zeros((nr * (2 * ns + 1) + 1,), np.float32)
    surgery_mask[idx] = 1.0
    surgery_mask_j = jnp.asarray(surgery_mask)

    p0 = np.load(args.p).astype(np.float32)
    keys = jax.random.split(jax.random.PRNGKey(args.base_seed), R)

    def make_restart(k):
        fresh = init_params_case3(k, ns, nr)
        return jnp.asarray(p0) * (1 - surgery_mask_j) + fresh * surgery_mask_j

    ps = jax.vmap(make_restart)(keys)

    def mean_loss(p, lo, hi):
        return jnp.mean(jax.vmap(lambda i: loss_i(p, i, mask_all))(
            jnp.arange(lo, hi)))

    def data_loss(p):
        return mean_loss(p, 0, cfg.n_exp_train)

    def val_loss(p):
        return mean_loss(p, cfg.n_exp_train, cfg.n_exp)

    val_all = jax.jit(jax.vmap(val_loss))

    stages = []
    for s in args.stages.split(","):
        lr_s, n_s = s.split(":")
        frozen = lr_s.startswith("f")
        stages.append((float(lr_s.lstrip("f")), int(n_s), frozen))

    best_val = np.full((R,), np.inf)
    best_p = np.array(ps)
    os.makedirs(args.out, exist_ok=True)
    tag = f"r{R}_seed{args.base_seed}"

    def snapshot():
        np.save(os.path.join(args.out, f"surgery_p_{tag}.npy"), best_p)
        np.save(os.path.join(args.out, f"surgery_val_{tag}.npy"), best_val)

    base_val = float(val_loss(jnp.asarray(p0)))
    print(f"[surgery] baseline p_best val {base_val:.4e}; "
          f"re-drawing cols {cols.tolist()} ({int(surgery_mask.sum())} of "
          f"{surgery_mask.size} params)", flush=True)

    for lr, n_epochs, frozen in stages:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_max),
                          optax.adamw(lr, weight_decay=1e-6))

        def one(p, opt_state):
            _, g = jax.value_and_grad(data_loss)(p)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            if frozen:
                g = g * surgery_mask_j
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
                if (e + 1) % 500 == 0 or e + 1 == 100:
                    dt = (time.time() - t0) / (e + 1)
                    print(f"[lr={lr:g}{' frozen' if frozen else ''}] "
                          f"{e+1}/{n_epochs} ({dt*1e3:.0f} ms/ep) val min "
                          f"{np.nanmin(lv):.4e} med {np.nanmedian(lv):.4e} "
                          f"best {best_val.min():.4e}", flush=True)
                    snapshot()
        ps = jnp.asarray(best_p)
        snapshot()
        print(f"[lr={lr:g}] stage done {time.time()-t0:.0f}s; "
              f"best val {best_val.min():.4e}", flush=True)

    order = np.argsort(best_val)
    r = int(order[0])
    champ = best_p[r]
    np.save(os.path.join(args.out, "p_surgery.npy"), champ)
    print(f"[surgery] champion restart {r}: val {best_val[r]:.4e} "
          f"(baseline {base_val:.4e})", flush=True)
    os.system(f"{sys.executable} scripts/grn_recovery.py "
              f"{os.path.join(args.out, 'p_surgery.npy')} {args.out}")


if __name__ == "__main__":
    main()

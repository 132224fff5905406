"""case1_rev integer-projection recovery attack (round 4).

The truth-init control (truth_init.md) proved the val surface ranks truth
(4.15e-3) far below the rotated basins (1.5-1.7e-2): recovery is an
optimization problem, not a data degeneracy. This attack starts from a
found basin instead of a random init: snap each reaction's learned
stoichiometry column to the nearest small-integer vector (mass-action
stoichiometries are integers; the reference's hard-threshold pruning is
the crude version of this), keep the learned rates, and retrain. If the
found basin is a rotation of truth, the snapped point lies in truth's
basin and descent reaches ~4e-3.

Usage: python scripts/case1_rev_project.py
           [--p runs/case1_rev/p_best_nr4_r16.npy] [--top 3]
           [--stages 1e-3:2000,3e-4:2000]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def snap_column(col):
    """Snap a stoichiometry column to the nearest integer vector with
    max |entry| in {1, 2}, trying both scalings and keeping the closer."""
    a = np.asarray(col, float)
    m = np.max(np.abs(a))
    if m < 1e-8:
        return np.zeros_like(a)
    best, best_err = None, np.inf
    for target in (1.0, 2.0):
        scaled = a / m * target
        snapped = np.clip(np.round(scaled), -2, 2)
        if not snapped.any():
            continue
        # compare direction only (rates absorb magnitude)
        u = snapped / np.linalg.norm(snapped)
        v = a / np.linalg.norm(a)
        err = min(np.linalg.norm(u - v), np.linalg.norm(u + v))
        if err < best_err:
            sign = 1.0 if np.dot(snapped, a) >= 0 else -1.0
            best, best_err = sign * snapped, err
    return best if best is not None else np.zeros_like(a)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", default="runs/case1_rev/p_best_nr4_r16.npy")
    ap.add_argument("--val", default="runs/case1_rev/val_best_nr4_r16.npy")
    ap.add_argument("--top", type=int, default=1,
                    help="project + retrain the top-K restarts (serial)")
    # low lr: the truth-init control showed lr 1e-3 Adam LEAVES the (narrow)
    # truth basin — val 4.15e-3 -> 1.3e-2 in 2k epochs — so a projection
    # landing near truth must be polished gently
    ap.add_argument("--stages", default="3e-4:1500,1e-4:1500")
    ap.add_argument("--out", default="runs/case1_rev")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from case1_rev_anneal import recovery_table
    from crnn_tpu.cases.case1_rev import Case1RevConfig, build
    from crnn_tpu.transforms.p2vec import p2vec_reversible

    cfg = Case1RevConfig(nr=4)
    setup = build(cfg)
    ds = setup.dataset
    mask_all = jnp.ones((cfg.datasize,), ds.ys.dtype)
    loss_i = setup.trainer.loss_i_exp

    def data_loss(p):
        return jnp.mean(jax.vmap(lambda i: loss_i(p, i, mask_all))(
            jnp.arange(cfg.n_exp_train)))

    def val_loss(p):
        return jnp.mean(jax.vmap(lambda i: loss_i(p, i, mask_all))(
            jnp.arange(cfg.n_exp_train, cfg.n_exp)))

    val_j, train_j = jax.jit(val_loss), jax.jit(data_loss)
    stages = [(float(s.split(":")[0]), int(s.split(":")[1]))
              for s in args.stages.split(",")]

    ps = np.load(args.p)
    if ps.ndim == 1:
        ps = ps[None]
    vals = (np.load(args.val) if os.path.exists(args.val)
            else np.zeros((ps.shape[0],)))
    order = np.argsort(vals)[:args.top]

    results = []
    for r in order:
        p0 = np.asarray(ps[r], float)
        w_kf = p0[:cfg.nr].copy()
        w_out = p0[cfg.nr:].reshape(cfg.ns, cfg.nr)
        w_snap = np.stack([snap_column(w_out[:, c])
                           for c in range(cfg.nr)], axis=1)
        p = jnp.asarray(np.concatenate([w_kf, w_snap.reshape(-1)]),
                        ds.ys.dtype)
        v_pre, v_snap = float(vals[r]) or float("nan"), float(val_j(p))
        print(f"restart {r}: val {v_pre:.4e} -> snapped {v_snap:.4e}",
              flush=True)
        best_val, best_p = v_snap, np.asarray(p)
        for lr, n_epochs in stages:
            opt = optax.adamw(lr, weight_decay=cfg.weight_decay)

            def one(p, opt_state):
                g = jax.jacfwd(data_loss)(p)
                g = jnp.where(jnp.isfinite(g), g, 0.0)
                updates, opt_state = opt.update(g, opt_state, p)
                return optax.apply_updates(p, updates), opt_state

            step = jax.jit(one)
            opt_state = opt.init(p)
            t0 = time.time()
            for e in range(n_epochs):
                p, opt_state = step(p, opt_state)
                if (e + 1) % 250 == 0:
                    lv = float(val_j(p))
                    if np.isfinite(lv) and lv < best_val:
                        best_val, best_p = lv, np.asarray(p)
                    if (e + 1) % 1000 == 0:
                        print(f"  [r{r} lr={lr:g}] {e+1}/{n_epochs} "
                              f"val {lv:.4e} best {best_val:.4e} "
                              f"({(time.time()-t0)/(e+1)*1e3:.0f} ms/ep)",
                              flush=True)
        w = p2vec_reversible(jnp.asarray(best_p), cfg.ns, cfg.nr)
        lines, n_match = recovery_table(
            np.asarray(w.w_kb), np.asarray(w.w_out), [1] * cfg.nr)
        results.append((int(r), v_pre, v_snap, best_val, n_match, lines,
                        best_p))
        print(f"restart {r}: retrained val {best_val:.4e}, "
              f"{n_match}/4 axes", flush=True)

    results.sort(key=lambda t: (-t[4], t[3]))
    os.makedirs(args.out, exist_ok=True)
    r, v_pre, v_snap, v_post, n_match, lines, p_win = results[0]
    np.save(os.path.join(args.out, "p_projected.npy"), p_win)
    with open(os.path.join(args.out, "projection_recovery.md"), "w") as f:
        f.write("# Integer-projection recovery attack\n\n")
        f.write("Snap each learned stoichiometry column of the restart-"
                "sweep basins to the nearest small-integer vector, keep "
                "rates, retrain (stages %s).\n\n" % args.stages)
        f.write("| restart | sweep val | snapped val | retrained val | "
                "axes |\n|---|---|---|---|---|\n")
        for rr, a, b, c, m, _, _bp in results:
            f.write(f"| {rr} | {a:.4e} | {b:.4e} | {c:.4e} | {m}/4 |\n")
        f.write(f"\n## Best: restart {r}\n\n")
        f.write("\n".join(lines) + "\n")
        ok = n_match == 4 and v_post < 8e-3
        f.write(f"\n**{'RECOVERED' if ok else 'NOT recovered'}**: "
                f"truth-basin val is 4.15e-3 (truth_init.md); this attack "
                f"reached {v_post:.4e} with {n_match}/4 axes.\n")
    print(f"BEST: restart {r} retrained val {v_post:.4e} {n_match}/4",
          flush=True)


if __name__ == "__main__":
    main()

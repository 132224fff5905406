"""case1_rev reaction-merging pass: cluster the redundant learned basis,
merge to the exact-size nr=4 model, fine-tune.

The 3/4 optimum distributes the C<->D channel across several redundant
proposals (mechanism_recovery.md); greedy leave-one-out dropping locks in
mixtures and L1 shrinks clean axes first (both negative results). This
pass instead merges the learned reactions UNSUPERVISED — agglomerative
clustering of the w_out stoichiometry columns by |cosine| (sign = learned
direction, so clustering is orientation-invariant), rate-weighted merge of
each cluster into one reaction, then fine-tune the exact-size nr=4 model.
Truth is consulted only AFTER fine-tuning, for the recovery table.

Usage: python scripts/case1_rev_merge.py [p.npy] [--stages 1e-3:10000,...]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from case1_rev_anneal import recovery_table


def merge_reactions(w_kf, w_out, target_nr=4):
    """Agglomerative |cos| clustering of stoichiometry columns; returns
    merged (w_kf', w_out') with target_nr reactions."""
    rates = np.exp(w_kf)                                # (nr,)
    clusters = [[j] for j in range(w_out.shape[1])]

    def direction(members):
        # rate-weighted mean of sign-aligned normalised columns
        seed = max(members, key=lambda j: rates[j])
        ref = w_out[:, seed] / (np.linalg.norm(w_out[:, seed]) + 1e-30)
        acc = np.zeros(w_out.shape[0])
        for j in members:
            c = w_out[:, j] / (np.linalg.norm(w_out[:, j]) + 1e-30)
            acc += rates[j] * (c if c @ ref >= 0 else -c)
        return acc / (np.linalg.norm(acc) + 1e-30)

    while len(clusters) > target_nr:
        best, pair = -1.0, None
        for a in range(len(clusters)):
            for b in range(a + 1, len(clusters)):
                c = abs(direction(clusters[a]) @ direction(clusters[b]))
                if c > best:
                    best, pair = c, (a, b)
        a, b = pair
        clusters[a] = clusters[a] + clusters[b]
        del clusters[b]

    w_kf_new = np.array([np.log(sum(rates[j] for j in m)) for m in clusters])
    # amplitude: keep the dominant member's column norm so the merged
    # reaction starts at the same flux scale it contributed before
    w_out_new = np.stack([
        direction(m) * max(np.linalg.norm(w_out[:, j]) for j in m)
        for m in clusters], axis=1)
    return w_kf_new, w_out_new


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("p_path", nargs="?", default="runs/case1_rev/p_best.npy")
    ap.add_argument("--stages", default="3e-4:10000,1e-4:10000")
    ap.add_argument("--out", default="runs/case1_rev")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from crnn_tpu.cases.case1_rev import Case1RevConfig, build
    from crnn_tpu.transforms.p2vec import p2vec_reversible

    cfg0 = Case1RevConfig()
    w0 = p2vec_reversible(jnp.asarray(np.load(args.p_path)), cfg0.ns, cfg0.nr)
    w_kf, w_out = merge_reactions(np.asarray(w0.w_kb), np.asarray(w0.w_out))
    print("merged directions:\n", np.round(w_out, 3), "\nrates",
          np.round(np.exp(w_kf), 3), flush=True)

    cfg = Case1RevConfig(nr=4)
    setup = build(cfg)
    ds = setup.dataset
    mask_all = jnp.ones((cfg.datasize,), ds.ys.dtype)
    loss_i = setup.trainer.loss_i_exp

    def data_loss(p):
        return jnp.mean(jax.vmap(lambda i: loss_i(p, i, mask_all))(
            jnp.arange(cfg.n_exp_train)))

    val_fn = jax.jit(lambda p: jnp.mean(
        jax.vmap(lambda i: loss_i(p, i, mask_all))(
            jnp.arange(cfg.n_exp_train, cfg.n_exp))))

    # p layout for p2vec_reversible: [w_kf(nr) | w_out(ns*nr)]
    p = jnp.asarray(np.concatenate([w_kf, w_out.reshape(-1)]),
                    ds.ys.dtype)
    best = (float(val_fn(p)), np.asarray(p))
    print(f"merged-init val {best[0]:.4e}", flush=True)

    for s in args.stages.split(","):
        lr, n = float(s.split(":")[0]), int(s.split(":")[1])
        opt = optax.adamw(lr, weight_decay=cfg.weight_decay)

        @jax.jit
        def step(p, opt_state):
            g = jax.jacfwd(data_loss)(p)
            g = jnp.where(jnp.isfinite(g), g, 0.0)
            updates, opt_state = opt.update(g, opt_state, p)
            return optax.apply_updates(p, updates), opt_state

        opt_state = opt.init(p)
        t0 = time.time()
        for e in range(n):
            p, opt_state = step(p, opt_state)
            if (e + 1) % 250 == 0:
                lv = float(val_fn(p))
                if np.isfinite(lv) and lv < best[0]:
                    best = (lv, np.asarray(p))
                if (e + 1) % 2500 == 0:
                    print(f"[lr={lr:g}] {e+1}/{n} val {lv:.4e} "
                          f"best {best[0]:.4e}", flush=True)
        print(f"[lr={lr:g}] done in {time.time()-t0:.0f}s", flush=True)
        p = jnp.asarray(best[1])

    w = p2vec_reversible(jnp.asarray(best[1]), cfg.ns, cfg.nr)
    lines, n_match = recovery_table(np.asarray(w.w_kb), np.asarray(w.w_out),
                                    [1] * cfg.nr)
    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "p_merged.npy"), best[1])
    with open(os.path.join(args.out, "merge_recovery.md"), "w") as f:
        f.write(f"# case1_rev reaction-merging pass (10 -> 4, stages "
                f"{args.stages})\n\nMerged-model best val {best[0]:.4e}.\n\n")
        f.write("\n".join(lines) + "\n")
        f.write(f"\n**{n_match}/4 true reversible reactions matched** "
                f"(|cos| > 0.95).\n")
    print(f"done: {n_match}/4 at val {best[0]:.4e}", flush=True)


if __name__ == "__main__":
    main()

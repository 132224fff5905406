"""Robertson hard-threshold prune + fine-tune -> clean sparse table
(VERDICT round-2 item 3b).

Zeroes w_out entries whose row-normalised |w_out_scale| < cutoff (the
case2_pruning.jl/case3_pruning.jl pattern applied to robertson), fine-
tunes the survivors briefly, and appends the resulting sparse table —
side by side with the reference's published table — to parity.md.

Usage: python scripts/robertson_prune.py [p.npy] [seed] [out.md]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from robertson_parity import REF_W_IN, REF_W_OUT_SCALE


def main(p_path, seed=7, out_md=None, cutoff=0.01, finetune=4000,
         lr=1e-4):
    import jax
    import jax.numpy as jnp

    from crnn_tpu.cases.robertson import RobertsonConfig, build
    from crnn_tpu.transforms.p2vec import p2vec_robertson

    cfg = RobertsonConfig(seed=seed)
    setup = build(cfg)
    ns, nr = cfg.ns, cfg.nr
    dydt = np.asarray(setup.dydt_scale)
    p = np.load(p_path)

    def scale_mask(p):
        w = p2vec_robertson(jnp.asarray(p, jnp.float64), ns, nr)
        w_out = np.asarray(w.w_out)                       # (ns, nr)
        sc = (w_out * dydt[:, None]).T                    # (nr, ns)
        sc = sc / (np.abs(sc).max(axis=1, keepdims=True) + 1e-300)
        return (np.abs(sc) >= cutoff).T                   # (ns, nr) keep-mask

    keep = scale_mask(p)
    print(f"pruning {int((~keep).sum())}/{keep.size} w_out entries "
          f"(relative cutoff {cutoff})", flush=True)

    setup_p = build(RobertsonConfig(
        seed=seed, lr=lr,
        w_out_mask=tuple(tuple(int(v) for v in row) for row in keep)))
    mask_all = jnp.ones((cfg.datasize,), jnp.float64)
    loss_i = setup_p.extras["loss_i_exp"]

    def mean_loss(pp):
        return float(jnp.mean(jax.vmap(
            lambda i: loss_i(jnp.asarray(pp, jnp.float64), i, mask_all))(
                jnp.arange(cfg.n_exp))))

    l_pruned = mean_loss(p)
    state = setup_p.trainer.init(jnp.asarray(p, jnp.float64))
    step = setup_p.trainer.epoch_fn()
    best = (np.inf, p)
    for e in range(finetune):
        state, m = step(state)
        if (e + 1) % 100 == 0:
            lv = float(m.loss_val)
            if np.isfinite(lv) and lv < best[0]:
                best = (lv, np.asarray(state.params))
    p_ft = best[1]
    l_ft = mean_loss(p_ft)
    w_ft = setup_p.weights_fn(jnp.asarray(p_ft, jnp.float64))

    w_in = np.asarray(w_ft.w_in).T                        # (nr, ns)
    w_out = np.asarray(w_ft.w_out)
    sc = (w_out * dydt[:, None]).T
    sc = sc / (np.abs(sc).max(axis=1, keepdims=True) + 1e-300)
    order = np.argsort(-np.abs(np.asarray(w_ft.w_b)))

    lines = [
        "\n## Sparse pruned table (relative cutoff "
        f"{cutoff}, fine-tuned {finetune} epochs; VERDICT item 3b)\n",
        f"Mean loss: pruned {l_pruned:.4e} -> fine-tuned {l_ft:.4e}. "
        f"Active w_out entries: {int(keep.sum())}/{keep.size}.\n",
        "| rxn | ours w_in | ours w_out_scale | ref w_in | ref w_out_scale |",
        "|---|---|---|---|---|",
    ]
    for i, j in enumerate(order):
        ref_i = REF_W_IN[i] if i < len(REF_W_IN) else None
        ref_s = REF_W_OUT_SCALE[i] if i < len(REF_W_OUT_SCALE) else None
        lines.append(
            f"| {i+1} | {np.round(w_in[j], 3).tolist()} "
            f"| {np.round(sc[j], 3).tolist()} "
            f"| {np.round(ref_i, 3).tolist() if ref_i is not None else ''} "
            f"| {np.round(ref_s, 3).tolist() if ref_s is not None else ''} |")
    out_md = out_md or f"runs/robertson_long/parity_seed{seed}_r3.md"
    mode = "a" if os.path.exists(out_md) else "w"
    with open(out_md, mode) as f:
        f.write("\n".join(lines) + "\n")
    np.save(f"runs/robertson_long/p_pruned_seed{seed}.npy", p_ft)
    print(f"appended sparse table to {out_md}; loss {l_pruned:.4e} -> "
          f"{l_ft:.4e}", flush=True)


if __name__ == "__main__":
    p_path = sys.argv[1] if len(sys.argv) > 1 else "runs/robertson_long/p_seed7_r3_final.npy"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    out = sys.argv[3] if len(sys.argv) > 3 else None
    finetune = int(sys.argv[4]) if len(sys.argv) > 4 else 4000
    lr = float(sys.argv[5]) if len(sys.argv) > 5 else 1e-4
    main(p_path, seed, out, finetune=finetune, lr=lr)

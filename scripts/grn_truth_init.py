"""GRN truth-init control: is 15/15 representable and does it HOLD?

The case1_rev truth-init control (runs/case1_rev/mechanism_recovery.md)
settled that case's recovery question decisively; this is the same
experiment for GRN's missing 15th reaction. runs/grn/p_best.npy matches
14/15 true reactions (val 3.63e-2) with DNA_C -> DNA_C + mRNA_C smeared
across 4 contaminated columns (r3/r8/r14/r15); three optimization
attacks (low-lr polish, cold polish, channel surgery) try to FIND the
clean channel. This control INSTALLS it analytically and asks whether
the data prefers it:

  p_clean : the 11 clean columns, contaminated columns killed
            (w_b=-20, w_in/w_out_raw cols zeroed).
  p_truth : p_clean + the exact DNA_C transcription channel in one
            freed column. With w_in[6,c]=1 (reactant DNA_C, order 1)
            and w_in[7,c]=-1 (product tie: w_out[7,c]=+|w_out_raw|,
            p2vec.py:97), the channel contributes
            exp(w_b)*y6*yscale[7]/t1 to dy7/dt, so truth
            (grn_truth r[8] = k8*y6, truth.py:118-140, k8=3.2) gives
            w_b = ln(k8*t1/yscale[7]) exactly. The learned gene-A/B
            transcription channels verify this formula as anchors.

Readout:
  val(p_clean)  vs val(p_best): how much real work the contaminated
            ensemble does beyond the clean 11.
  val(p_truth) vs val(p_best): if LOWER, 15/15 is strictly better and
            the failure to find it is optimization dynamics (as in
            case1_rev); if HIGHER, the smeared ensemble genuinely fits
            the noisy data better — a noise-floor identifiability
            limit, proven rather than conjectured.
  low-lr train from p_truth: does the installed channel HOLD
            (match table via grn_recovery.py) and where does val go?

Usage: python scripts/grn_truth_init.py [--epochs 3000] [--lr 1e-4]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cols", default="2,7,13,14")
    ap.add_argument("--truth-col", type=int, default=2,
                    help="freed column that receives the true channel")
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--p", default="runs/grn/p_best.npy")
    ap.add_argument("--out", default="runs/grn_truth_init")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from crnn_tpu.cases.case3 import build, grn_config
    from crnn_tpu.data.truth import GRN_K

    cfg = grn_config()
    setup = build(cfg)
    loss_i = setup.trainer.loss_i_exp
    mask_all = jnp.ones((cfg.datasize,), jnp.float32)
    ns, nr = cfg.ns, cfg.nr
    t1 = float(cfg.datasize * cfg.tstep)
    yscale = np.asarray(setup.dataset.yscale)
    cols = [int(c) for c in args.cols.split(",")]

    def mean_loss(p, lo, hi):
        return jnp.mean(jax.vmap(lambda i: loss_i(p, i, mask_all))(
            jnp.arange(lo, hi)))

    val_loss = jax.jit(lambda p: mean_loss(p, cfg.n_exp_train, cfg.n_exp))
    train_loss = jax.jit(lambda p: mean_loss(p, 0, cfg.n_exp_train))

    # param layout (p2vec_case3): [w_b nr][w_out_raw ns*nr][w_in ns*nr][slope]
    def col_idx(block, s, c):
        return (block + s) * nr + c  # block 1 = w_out_raw rows, 1+ns = w_in

    p_best = np.load(args.p).astype(np.float32)
    base_val = float(val_loss(jnp.asarray(p_best)))

    # sanity anchors: learned w_b for the clean gene-A/B transcription
    # channels vs the analytic ln(k*t1/yscale_mRNA) prediction
    os.makedirs(args.out, exist_ok=True)
    lines = ["# GRN truth-init control", "",
             f"baseline p_best: val {base_val:.4e} (14/15)", ""]
    w_b = p_best[:nr]
    w_in = p_best[nr * (ns + 1):nr * (2 * ns + 1)].reshape(ns, nr)
    anchors = []
    for gene, (dna, mrna, k) in {"A": (0, 1, float(GRN_K[0])),
                                 "B": (3, 4, float(GRN_K[4]))}.items():
        # find the learned column whose w_in is ~one-hot on the DNA species
        scores = w_in[dna, :] - np.abs(w_in).sum(0) + np.abs(w_in[dna, :])
        c = int(np.argmax(scores))
        pred = float(np.log(k * t1 / yscale[mrna]))
        anchors.append((gene, c, float(w_b[c]), pred))
        lines.append(f"anchor gene {gene}: learned col r{c+1} "
                     f"w_b={w_b[c]:+.3f}, analytic ln(k*t1/ys)="
                     f"{pred:+.3f}")
    print("\n".join(lines[-2:]), flush=True)

    # p_clean: kill the contaminated columns
    p_clean = p_best.copy()
    for c in cols:
        p_clean[c] = -20.0                       # w_b -> rate ~ 2e-9
        for s in range(ns):
            p_clean[col_idx(1, s, c)] = 0.0      # w_out_raw
            p_clean[col_idx(1 + ns, s, c)] = 0.0  # w_in
    clean_val = float(val_loss(jnp.asarray(p_clean)))

    # p_truth: install the exact DNA_C transcription channel
    c = args.truth_col
    p_truth = p_clean.copy()
    p_truth[c] = float(np.log(float(GRN_K[8]) * t1 / yscale[7]))
    p_truth[col_idx(1, 7, c)] = 1.0       # |w_out_raw[7,c]| = 1
    p_truth[col_idx(1 + ns, 6, c)] = 1.0  # reactant DNA_C, order 1
    p_truth[col_idx(1 + ns, 7, c)] = -1.0  # product tie -> w_out[7,c]=+1
    truth_val = float(val_loss(jnp.asarray(p_truth)))
    truth_train = float(train_loss(jnp.asarray(p_truth)))

    lines += ["",
              f"p_clean (11 channels):      val {clean_val:.4e}",
              f"p_truth (11 + true DNA_C):  val {truth_val:.4e} "
              f"train {truth_train:.4e}",
              f"p_best  (14/15 smeared):    val {base_val:.4e}", ""]
    print("\n".join(lines[-5:]), flush=True)
    np.save(os.path.join(args.out, "p_truth_init.npy"), p_truth)

    # low-lr train from p_truth: does the channel hold?
    opt = optax.chain(optax.clip_by_global_norm(cfg.grad_max),
                      optax.adamw(args.lr, weight_decay=1e-6))

    @jax.jit
    def step(p, opt_state):
        l, g = jax.value_and_grad(train_loss)(p)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        updates, opt_state = opt.update(g, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, l

    p = jnp.asarray(p_truth)
    opt_state = opt.init(p)
    best_val, best_p = truth_val, p_truth.copy()
    t0 = time.time()
    for e in range(args.epochs):
        p, opt_state, l = step(p, opt_state)
        if (e + 1) % 100 == 0:
            v = float(val_loss(p))
            if np.isfinite(v) and v < best_val:
                best_val, best_p = v, np.asarray(p)
            if (e + 1) % 500 == 0 or e + 1 == 100:
                print(f"[truth-init lr={args.lr:g}] {e+1}/{args.epochs} "
                      f"train {float(l):.4e} val {v:.4e} "
                      f"best {best_val:.4e} "
                      f"({(time.time()-t0)/(e+1)*1e3:.0f} ms/ep)",
                      flush=True)
                np.save(os.path.join(args.out, "p_polished.npy"), best_p)

    np.save(os.path.join(args.out, "p_polished.npy"), best_p)
    lines += [f"after {args.epochs} epochs @ lr {args.lr:g}: "
              f"best val {best_val:.4e} (vs p_best {base_val:.4e})", ""]
    with open(os.path.join(args.out, "control.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"[truth-init] done: best val {best_val:.4e}", flush=True)
    os.system(f"{sys.executable} scripts/grn_recovery.py "
              f"{os.path.join(args.out, 'p_polished.npy')} {args.out}")


if __name__ == "__main__":
    main()

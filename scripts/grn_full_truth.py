"""GRN FULL truth-init control: encode the entire 15-reaction truth
network exactly in CRNN parameters and ask what the data says.

The p2vec_case3 tie (w_out = -w_in_raw * |w_out_raw|, p2vec.py:97) with
the scaled RHS (rhs = (w_out @ exp(w_in.T log y + w_b)) * yscale/t1,
crnn.py:83-93) can represent ANY mass-action reaction exactly:

  column c for reaction  sum_r o_r S_r -> products, rate k_c:
    w_b[c]            = ln(k_c * t1)
    reactant s        : w_in[s,c] = o_r,  |w_out_raw[s,c]| = |net_s|/yscale[s]
    product-only s    : w_in[s,c] = -1,   |w_out_raw[s,c]| = net_s/yscale[s]
    catalyst (net 0)  : w_in[s,c] = o_r,  w_out_raw[s,c] = 0

  giving channel contribution net_s * k_c * prod y^o to dy_s/dt — the
  truth term exactly (grn_truth, data/truth.py:118-140). DNA rows are
  frozen in p2vec so their (zero-net) entries are irrelevant.

This is the decisive identifiability control for the missing 15th
reaction (runs/grn/mechanism_recovery.md: 14/15, DNA_C transcription
smeared): val at EXACT truth vs the smeared 14/15 optimum separates

  val(truth) << 3.63e-2 : truth fits better; three failed attacks
      (polish, cold polish, channel surgery) are optimization dynamics,
      as in case1_rev (runs/case1_rev/mechanism_recovery.md).
  val(truth) >= 3.63e-2 : the smeared ensemble fits the noisy data as
      well as truth itself — 14/15 is the data's identifiability limit,
      proven rather than conjectured.

Then trains from truth at low lr: does val improve, and does the
DNA_C transcription channel HOLD (grn_recovery.py match table)?

Usage: python scripts/grn_full_truth.py [--epochs 3000] [--lr 1e-4]
           [--eval-only]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# (reactants {s: order}, nets {s: stoich}) per truth reaction, in GRN_K
# order (grn_truth r[0..14]); species 0..8 = DNA_A, mRNA_A, A, DNA_B,
# mRNA_B, B, DNA_C, mRNA_C, C
REACTIONS = [
    ({0: 1}, {1: +1}),          # DNA_A -> DNA_A + mRNA_A
    ({1: 1}, {2: +1}),          # mRNA_A -> mRNA_A + A
    ({1: 1}, {1: -1}),          # mRNA_A -> 0
    ({2: 1}, {2: -1}),          # A -> 0
    ({3: 1}, {4: +1}),          # DNA_B -> DNA_B + mRNA_B
    ({4: 1}, {5: +1}),          # mRNA_B -> mRNA_B + B
    ({4: 1}, {4: -1}),          # mRNA_B -> 0
    ({5: 1}, {5: -1}),          # B -> 0
    ({6: 1}, {7: +1}),          # DNA_C -> DNA_C + mRNA_C
    ({7: 1}, {8: +1}),          # mRNA_C -> mRNA_C + C
    ({7: 1}, {7: -1}),          # mRNA_C -> 0
    ({8: 1}, {8: -1}),          # C -> 0
    ({7: 1, 2: 1}, {7: -1}),    # mRNA_C + A -> A
    ({4: 1, 8: 1}, {4: -1}),    # mRNA_B + C -> C
    ({1: 1, 5: 1}, {1: -1}),    # mRNA_A + B -> B
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--out", default="runs/grn_full_truth")
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

    def mean_loss(p, lo, hi):
        return jnp.mean(jax.vmap(lambda i: loss_i(p, i, mask_all))(
            jnp.arange(lo, hi)))

    val_loss = jax.jit(lambda p: mean_loss(p, cfg.n_exp_train, cfg.n_exp))
    train_loss = jax.jit(lambda p: mean_loss(p, 0, cfg.n_exp_train))

    # assemble exact-truth params in the p2vec_case3 layout
    w_b = np.zeros(nr, np.float32)
    w_out_raw = np.zeros((ns, nr), np.float32)
    w_in = np.zeros((ns, nr), np.float32)
    for c, (orders, nets) in enumerate(REACTIONS):
        w_b[c] = np.log(float(GRN_K[c]) * t1)
        for s, o in orders.items():
            w_in[s, c] = float(o)
        for s, net in nets.items():
            if s in orders:                      # consumed reactant
                w_out_raw[s, c] = abs(net) / yscale[s]
            else:                                # product-only species
                w_in[s, c] = -1.0
                w_out_raw[s, c] = net / yscale[s]
    p_truth = np.concatenate(
        [w_b, w_out_raw.reshape(-1), w_in.reshape(-1),
         np.array([0.1], np.float32)])

    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "p_full_truth.npy"), p_truth)

    p_best = np.load("runs/grn/p_best.npy").astype(np.float32)
    base_val = float(val_loss(jnp.asarray(p_best)))
    base_train = float(train_loss(jnp.asarray(p_best)))
    tv = float(val_loss(jnp.asarray(p_truth)))
    tt = float(train_loss(jnp.asarray(p_truth)))
    lines = ["# GRN full truth-init control", "",
             f"p_best (learned 14/15): train {base_train:.4e} "
             f"val {base_val:.4e}",
             f"p_truth (exact 15/15):  train {tt:.4e} val {tv:.4e}", ""]
    print("\n".join(lines), flush=True)

    if args.eval_only:
        with open(os.path.join(args.out, "control.md"), "w") as f:
            f.write("\n".join(lines) + "\n")
        return

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
    best_val, best_p = tv, p_truth.copy()
    t0 = time.time()
    for e in range(args.epochs):
        p, opt_state, l = step(p, opt_state)
        if (e + 1) % 100 == 0:
            v = float(val_loss(p))
            if np.isfinite(v) and v < best_val:
                best_val, best_p = v, np.asarray(p)
            if (e + 1) % 500 == 0 or e + 1 == 100:
                print(f"[full-truth lr={args.lr:g}] {e+1}/{args.epochs} "
                      f"train {float(l):.4e} val {v:.4e} "
                      f"best {best_val:.4e} "
                      f"({(time.time()-t0)/(e+1)*1e3:.0f} ms/ep)",
                      flush=True)
                np.save(os.path.join(args.out, "p_polished.npy"), best_p)

    np.save(os.path.join(args.out, "p_polished.npy"), best_p)
    lines += [f"trained from truth {args.epochs} epochs @ lr {args.lr:g}: "
              f"best val {best_val:.4e} (smeared optimum {base_val:.4e})",
              ""]
    with open(os.path.join(args.out, "control.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"[full-truth] done: best val {best_val:.4e}", flush=True)
    os.system(f"{sys.executable} scripts/grn_recovery.py "
              f"{os.path.join(args.out, 'p_polished.npy')} {args.out}")


if __name__ == "__main__":
    main()

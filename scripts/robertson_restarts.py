"""Independent Robertson basin hunt: vmapped multi-restart sweep + LM polish.

Round-3 closed the parity question by fine-tuning FROM the published
table (3.29e-3 all-25 loss vs the table's own 6.49e-3 under this solver);
what remained open (round-3 VERDICT item 4) is an INDEPENDENT optimum:
can this framework find a published-quality basin from scratch? Target:
all-25 loss <= 6.5e-3 with no warm start (reference basin evidence:
robertson/ReadMe.md:15-36; our previous from-scratch best 1.03e-2).

TPU-native shape (same machinery as scripts/case1_rev_restarts.py): R
restarts train SIMULTANEOUSLY under one vmap over the parameter axis;
staged lr descent on the 20 training experiments; per-restart best
selected on the 5 held-out experiments; top-K polished with
Levenberg-Marquardt (rober_crnn_lm.jl analogue, train/lm.py); headline =
best all-25 full-horizon loss.

Usage: python scripts/robertson_restarts.py [--restarts 16]
           [--stages 5e-3:4000,1e-3:4000,3e-4:4000] [--base-seed 11]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--restarts", type=int, default=16)
    # final 1e-4 stage: the case1_rev truth-init control showed Adam step
    # noise at lr >= 1e-3 can eject iterates from narrow good basins —
    # polish gently before judging a basin's depth
    ap.add_argument("--stages",
                    default="5e-3:4000,1e-3:4000,3e-4:3000,1e-4:3000")
    ap.add_argument("--base-seed", type=int, default=11)
    ap.add_argument("--lm-top", type=int, default=3)
    ap.add_argument("--lm-iters", type=int, default=150)
    ap.add_argument("--out", default="runs/robertson_long")
    ap.add_argument("--lm-only", action="store_true",
                    help="skip the Adam stages; load the snapshotted "
                         "best_p/best_val and run only the LM polish")
    # sparsity-seeded hunt: the seed-11 sweep + pruning diagnosis showed
    # random init lands in DENSE basins structurally unlike the published
    # sparse mechanism — L1 on the active reaction orders (w_in slice;
    # w_out = -w_in * 10^raw ties output sparsity to it) biases the
    # search toward sparse basins during training, not post-hoc
    ap.add_argument("--l1", type=float, default=0.0,
                    help="L1 on active reaction orders (train loss only)")
    # TPU-scale staging (round 5): hunt basins in f32 (~10x cheaper epochs
    # on TPU where f64 is emulated), then re-enter the best params in f64
    # via --init-from for the depth stages + LM. Basin SELECTION tolerates
    # the f32 loss floor (1.4e-2); basin DEPTH does not.
    ap.add_argument("--dtype", default="float64",
                    help="training precision for the Adam stages")
    ap.add_argument("--init-from", default=None,
                    help="npy of (R, np) params to continue from instead "
                         "of fresh random inits (two-phase f32 -> f64 hunt)")
    ap.add_argument("--tag", default=None,
                    help="artifact tag override (default r<R>_seed<seed>)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from crnn_tpu.cases.robertson import (RobertsonConfig, build,
                                          run_lm_finish)
    from crnn_tpu.transforms.p2vec import init_params_robertson

    cfg = RobertsonConfig(dtype=args.dtype)
    setup = build(cfg)
    ds = setup.dataset
    loss_i = setup.extras["loss_i_exp"]
    train_dtype = jnp.dtype(args.dtype)
    mask_all = jnp.ones((cfg.datasize,), train_dtype)
    R = args.restarts

    if args.init_from:
        ps = jnp.asarray(np.load(args.init_from), train_dtype)
        R = ps.shape[0]
        print(f"continuing {R} restarts from {args.init_from} "
              f"in {args.dtype}", flush=True)
    else:
        keys = jax.random.split(jax.random.PRNGKey(args.base_seed), R)
        ps = jax.vmap(lambda k: init_params_robertson(
            k, cfg.ns, cfg.nr, dtype=train_dtype))(keys)

    def mean_loss(p, lo, hi):
        return jnp.mean(jax.vmap(lambda i: loss_i(p, i, mask_all))(
            jnp.arange(lo, hi)))

    i0, i1 = cfg.nr * (cfg.ns + 1), cfg.nr * (2 * cfg.ns + 1)

    def data_loss(p):
        base = mean_loss(p, 0, cfg.n_exp_train)
        if args.l1 > 0:
            base = base + args.l1 * jnp.sum(jax.nn.relu(p[i0:i1]))
        return base

    def val_loss(p):
        return mean_loss(p, cfg.n_exp_train, cfg.n_exp)

    def all25_loss(p):
        return mean_loss(p, 0, cfg.n_exp)

    val_all = jax.jit(jax.vmap(val_loss))
    all25_j = jax.jit(all25_loss)

    stages = [(float(s.split(":")[0]), int(s.split(":")[1]))
              for s in args.stages.split(",")]

    best_val = np.full((R,), np.inf)
    best_p = np.array(ps)
    os.makedirs(args.out, exist_ok=True)
    tag = args.tag or f"r{R}_seed{args.base_seed}"
    if args.l1 > 0 and not args.tag:
        tag += f"_l1_{args.l1:g}"

    def snapshot():
        np.save(os.path.join(args.out, f"restart_p_{tag}.npy"), best_p)
        np.save(os.path.join(args.out, f"restart_val_{tag}.npy"), best_val)

    if args.lm_only:
        best_p = np.load(os.path.join(args.out, f"restart_p_{tag}.npy"))
        best_val = np.load(os.path.join(args.out, f"restart_val_{tag}.npy"))
        stages = []

    for lr, n_epochs in stages:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_max),
                          optax.adamw(lr, weight_decay=cfg.weight_decay))

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
        ps = jnp.asarray(best_p)    # continue each restart from its best
        snapshot()
        print(f"[lr={lr:g}] stage done {time.time()-t0:.0f}s; "
              f"best val {best_val.min():.4e}", flush=True)

    # ---- LM polish on the top-K restarts (rober_crnn_lm.jl finisher) ----
    order = np.argsort(best_val)
    rows = []
    champion = (np.inf, None, -1)
    for r in order[:args.lm_top]:
        p_in = jnp.asarray(best_p[r])
        a25_before = float(all25_j(p_in))
        try:
            p_lm, _ = run_lm_finish(setup, p_in, max_iters=args.lm_iters)
            a25_after = float(all25_j(jnp.asarray(p_lm)))
        except Exception as e:
            print(f"LM polish failed on restart {r}: "
                  f"{type(e).__name__}: {e}", flush=True)
            p_lm, a25_after = p_in, a25_before
        pick = p_lm if a25_after <= a25_before else p_in
        a25 = min(a25_after, a25_before)
        rows.append((int(r), float(best_val[r]), a25_before, a25_after))
        if a25 < champion[0]:
            champion = (a25, np.asarray(pick), int(r))
        print(f"restart {r}: val {best_val[r]:.4e} all25 {a25_before:.4e} "
              f"-> LM {a25_after:.4e}", flush=True)

    if champion[1] is None:
        print(f"phase done (no LM polish requested); best val "
              f"{best_val.min():.4e} -> {args.out}/restart_p_{tag}.npy",
              flush=True)
        return
    np.save(os.path.join(args.out, f"p_independent_{tag}.npy"), champion[1])
    md = os.path.join(args.out, f"independent_hunt_{tag}.md")
    with open(md, "w") as f:
        l1_note = (f", L1(w_in) {args.l1:g} on train loss"
                   if args.l1 > 0 else "")
        f.write(f"# Independent Robertson basin hunt ({R} restarts, "
                f"stages {args.stages}, seed {args.base_seed}{l1_note})\n\n")
        f.write("No warm start: every restart drawn from the reference's "
                "own init distribution (rober_crnn.jl:37-39).\n\n")
        f.write("| restart | best val | all-25 pre-LM | all-25 post-LM |\n")
        f.write("|---|---|---|---|\n")
        for r, v, b, a in rows:
            f.write(f"| {r} | {v:.4e} | {b:.4e} | {a:.4e} |\n")
        f.write(f"\n**Champion: restart {champion[2]}, all-25 loss "
                f"{champion[0]:.4e}** (published table under this solver: "
                f"6.49e-3; round-3 fine-tune from it: 3.29e-3; previous "
                f"from-scratch best: 1.03e-2).\n")
        target = "MET" if champion[0] <= 6.5e-3 else "NOT met"
        f.write(f"\nTarget all-25 <= 6.5e-3: **{target}**.\n")
    print(f"CHAMPION all-25 {champion[0]:.4e} (restart {champion[2]}) "
          f"-> {md}", flush=True)


if __name__ == "__main__":
    main()

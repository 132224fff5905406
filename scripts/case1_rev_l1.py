"""case1_rev L1-sparsified fine-tune: break the rotational degeneracy.

The leave-one-out anneal (case1_rev_anneal.py) showed the val surface is
flat under rotations of the redundant reaction basis — greedy dropping
locks in MIXTURES of true reactions (anneal_log.md: 1/4 clean axes). The
verdict's alternative lever: an L1 penalty on w_out during fine-tuning
pushes the basis toward sparse (axis-aligned) stoichiometry columns while
the data term holds the span — then measure cosines against the truth.

Usage: python scripts/case1_rev_l1.py [p.npy] [lambda] [epochs]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from case1_rev_anneal import recovery_table


def main(p_path="runs/case1_rev/p_best.npy", lam=3e-4, n_epochs=30000,
         out_dir="runs/case1_rev"):
    import jax
    import jax.numpy as jnp
    import optax

    from crnn_tpu.cases.case1_rev import Case1RevConfig, build
    from crnn_tpu.transforms.p2vec import p2vec_reversible

    cfg = Case1RevConfig()
    setup = build(cfg)
    ds = setup.dataset
    p0 = jnp.asarray(np.load(p_path))
    mask_all = jnp.ones((cfg.datasize,), ds.ys.dtype)

    loss_eval = setup.trainer.loss_i_exp_eval

    def data_loss(p):
        losses = jax.vmap(lambda i: loss_eval(p, i, mask_all))(
            jnp.arange(cfg.n_exp_train))
        return jnp.mean(losses)

    def total_loss(p):
        w = p2vec_reversible(p, cfg.ns, cfg.nr)
        return data_loss(p) + lam * jnp.sum(jnp.abs(w.w_out))

    opt = optax.adamw(3e-4, weight_decay=1e-8)

    @jax.jit
    def epoch(p, opt_state):
        loss = total_loss(p)
        g = jax.jacfwd(total_loss)(p)   # fwd-mode (reversible RHS rev-mode
        g = jnp.where(jnp.isfinite(g), g, 0.0)  # instability, case1_rev.py)
        updates, opt_state = opt.update(g, opt_state, p)
        return optax.apply_updates(p, updates), opt_state, loss

    @jax.jit
    def val_loss(p):
        losses = jax.vmap(lambda i: loss_eval(p, i, mask_all))(
            jnp.arange(cfg.n_exp_train, cfg.n_exp))
        return jnp.mean(losses)

    p, opt_state = p0, opt.init(p0)
    best = (np.inf, np.asarray(p0))
    for e in range(n_epochs):
        p, opt_state, loss = epoch(p, opt_state)
        if (e + 1) % 500 == 0:
            lv = float(val_loss(p))
            if np.isfinite(lv) and lv < best[0]:
                best = (lv, np.asarray(p))
            if (e + 1) % 5000 == 0:
                print(f"{e+1}: total {float(loss):.4e} val {lv:.4e} "
                      f"best {best[0]:.4e}", flush=True)
    p_fin = jnp.asarray(best[1])

    w = p2vec_reversible(p_fin, cfg.ns, cfg.nr)
    w_kf = np.asarray(w.w_kb)
    w_out = np.asarray(w.w_out)
    # effective rate * column magnitude: reactions that died under L1
    eff = np.exp(w_kf) * np.abs(w_out).max(axis=0)
    active = eff > 0.05 * eff.max()
    lines, n_match = recovery_table(w_kf, w_out * active[None, :],
                                    active.astype(int).tolist())
    np.save(os.path.join(out_dir, "p_l1.npy"), np.asarray(p_fin))
    with open(os.path.join(out_dir, "l1_recovery.md"), "w") as f:
        f.write(f"# case1_rev L1-sparsified fine-tune (lambda={lam:g}, "
                f"{n_epochs} epochs)\n\n")
        f.write(f"Best val (data term) {best[0]:.4e}; active reactions "
                f"(eff rate > 5% max): {int(active.sum())}/{cfg.nr}.\n\n")
        f.write("\n".join(lines) + "\n")
        f.write(f"\n**{n_match}/4 true reversible reactions matched** "
                f"(|cos| > 0.95).\n")
    print(f"done: {n_match}/4 matched at val {best[0]:.4e}, "
          f"{int(active.sum())} active", flush=True)


if __name__ == "__main__":
    p_path = sys.argv[1] if len(sys.argv) > 1 else "runs/case1_rev/p_best.npy"
    lam = float(sys.argv[2]) if len(sys.argv) > 2 else 3e-4
    n_ep = int(sys.argv[3]) if len(sys.argv) > 3 else 30000
    main(p_path, lam, n_ep)

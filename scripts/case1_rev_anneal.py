"""case1_rev prune-anneal: leave-one-out reduction of the nr=10 reversible
proposal to the 4 true reversible reactions (VERDICT.md round-2 item 4).

Round-2 state: val 1.37e-2 but only 3/4 reactions resolved — the C<->D
channel smeared across redundant proposals. The reference's own ReadMe
prescribes the cure for over-parameterised ansatzes: "the leave one out
method, one can disable a reaction each time and see the effect"
(robertson/ReadMe.md:7). This script applies it as an anneal: starting
from the converged optimum, repeatedly (a) evaluate the training loss
with each active reaction individually disabled, (b) permanently disable
the one whose removal hurts least, (c) fine-tune the survivors. Stopping
at 4 active reactions forces the redundant C<->D mass to consolidate
into a single channel.

Usage: python scripts/case1_rev_anneal.py [p_best.npy] [out_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRUE_ROWS = {
    "A <-> B":      np.array([-1.0, 1.0, 0.0, 0.0, 0.0]),
    "B <-> C":      np.array([0.0, -1.0, 1.0, 0.0, 0.0]),
    "C <-> D":      np.array([0.0, 0.0, -1.0, 1.0, 0.0]),
    "2C <-> D + E": np.array([0.0, 0.0, -2.0, 1.0, 1.0]),
}


def recovery_table(w_kf, w_out, mask):
    """(lines, n_matched): per-active-reaction best truth match by cosine."""
    lines = ["| learned rxn | normalised w_out | exp(w_k) | best match | cos |",
             "|---|---|---|---|---|"]
    active = [j for j in range(len(mask)) if mask[j]]
    matched = set()
    rows = []
    for j in active:
        col = w_out[:, j]
        norm = col / (np.abs(col).max() + 1e-30)
        best_name, best_cos = None, 0.0
        for name, tr in TRUE_ROWS.items():
            c = float(col @ tr / (np.linalg.norm(col) * np.linalg.norm(tr)
                                  + 1e-30))
            if abs(c) > abs(best_cos):
                best_name, best_cos = name, c
        rows.append((j, norm, float(np.exp(w_kf[j])), best_name, best_cos))
        if abs(best_cos) > 0.95:
            matched.add(best_name)
    rows.sort(key=lambda r: -r[2])
    for j, norm, rate, name, c in rows:
        lines.append(
            f"| r{j+1} | {np.round(np.asarray(norm, np.float64), 3).tolist()}"
            f" | {rate:.3f} | {name} | {c:+.3f} |")
    return lines, len(matched)


def main(p_path="runs/case1_rev/p_best.npy", out_dir="runs/case1_rev",
         finetune_epochs=3000, final_epochs=8000, target_nr=4):
    import jax
    import jax.numpy as jnp

    from crnn_tpu.cases.case1_rev import Case1RevConfig, build
    from crnn_tpu.models.crnn import make_crnn_reversible_rhs
    from crnn_tpu.ode import Tsit5, odesolve
    from crnn_tpu.train.loss import make_trajectory_loss
    from crnn_tpu.transforms.p2vec import p2vec_reversible

    cfg0 = Case1RevConfig()
    base = build(cfg0)
    ds = base.dataset
    p = jnp.asarray(np.load(p_path))
    nr = cfg0.nr
    mask = [1] * nr
    log = []

    # one compiled evaluator with the reaction mask as a RUNTIME argument
    # (leave-one-out probes would otherwise recompile per mask pattern)
    rhs = make_crnn_reversible_rhs(cfg0.lb)
    solver = Tsit5()
    t1 = cfg0.datasize * cfg0.tstep
    saveat = jnp.asarray(ds.ts)
    loss_fn = make_trajectory_loss("mae", yscale=ds.yscale)
    m_all = jnp.ones((cfg0.datasize,), ds.ys.dtype)

    @jax.jit
    def losses_with_mask(p, rmask):
        w = p2vec_reversible(p, cfg0.ns, cfg0.nr)
        w = w._replace(w_out=w.w_out * rmask[None, :])

        def one(u0_i, ys_i):
            sol = odesolve(rhs, solver, u0_i, 0.0, t1, saveat, args=w,
                           rtol=cfg0.rtol, atol=cfg0.atol,
                           max_steps=cfg0.max_steps, unroll="while")
            return loss_fn(sol.ys, ys_i, m_all)

        return jax.vmap(one)(ds.u0, ds.ys)

    def eval_losses(p, m):
        losses = losses_with_mask(p, jnp.asarray(m, ds.ys.dtype))
        lt = float(jnp.mean(losses[:cfg0.n_exp_train]))
        lv = float(jnp.mean(losses[cfg0.n_exp_train:]))
        return lt, lv

    lt0, lv0 = eval_losses(p, mask)
    log.append(f"start: train {lt0:.4e} val {lv0:.4e}, active {sum(mask)}")
    print(log[-1], flush=True)

    while sum(mask) > target_nr:
        # --- leave-one-out: which active reaction is cheapest to drop? ----
        candidates = []
        for j in range(nr):
            if not mask[j]:
                continue
            trial = list(mask)
            trial[j] = 0
            lt, _ = eval_losses(p, trial)
            candidates.append((lt, j))
        candidates.sort()
        drop = candidates[0][1]
        mask[drop] = 0
        log.append(f"drop r{drop+1} (leave-one-out train loss "
                   f"{candidates[0][0]:.4e}); active {sum(mask)}")
        print(log[-1], flush=True)

        # --- fine-tune survivors ------------------------------------------
        setup = build(Case1RevConfig(reaction_mask=tuple(mask)))
        state = setup.trainer.init(p)
        n_ep = final_epochs if sum(mask) == target_nr else finetune_epochs
        step = setup.trainer.epoch_fn()
        best = (np.inf, p)
        for e in range(n_ep):
            state, m = step(state)
            if (e + 1) % 200 == 0:
                lv = float(m.loss_val)
                if lv < best[0] and np.isfinite(lv):
                    best = (lv, state.params)
        p = best[1]
        lt, lv = eval_losses(p, mask)
        log.append(f"fine-tuned {n_ep} epochs: train {lt:.4e} val {lv:.4e}")
        print(log[-1], flush=True)

    # --- report ------------------------------------------------------------
    from crnn_tpu.transforms.p2vec import p2vec_reversible

    w = p2vec_reversible(p, 5, nr)
    w_kf = np.asarray(w.w_kb)          # forward log-k (w_kb = w_kf, Kc=1)
    w_out = np.asarray(w.w_out) * np.asarray(mask)[None, :]
    lines, n_match = recovery_table(w_kf, w_out, mask)

    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "p_anneal.npy"), np.asarray(p))
    with open(os.path.join(out_dir, "anneal_log.md"), "w") as f:
        f.write("# case1_rev leave-one-out prune-anneal\n\n")
        f.write("\n".join("- " + x for x in log) + "\n\n")
        f.write("\n".join(lines) + "\n")
        f.write(f"\n**{n_match}/4 true reversible reactions matched** "
                f"(|cos| > 0.95) with {sum(mask)} active reactions.\n")
    print(f"done: {n_match}/4 matched, final train {lt:.4e} val {lv:.4e}",
          flush=True)


if __name__ == "__main__":
    p_path = sys.argv[1] if len(sys.argv) > 1 else "runs/case1_rev/p_best.npy"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "runs/case1_rev"
    main(p_path, out_dir)

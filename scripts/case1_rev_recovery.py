"""case1_rev mechanism-recovery table: match learned reversible reactions.

Truth (case1 rev/case1.jl:37-43): A<->B, B<->C, C<->D, 2C<->D+E, all rate
constants 1 (so Kc=1 is exact and the converged w_k should be ~0, since
rate = exp(w_k)). The CRNN proposes nr=10 reversible reactions; a learned
reaction matches a true one when its normalised w_out column is (anti-)
parallel to the true net stoichiometry.

Usage: python scripts/case1_rev_recovery.py <p_best.npy> [out_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SPECIES = ["A", "B", "C", "D", "E"]
TRUE_RXNS = [
    ("A <-> B", np.array([-1.0, 1.0, 0.0, 0.0, 0.0])),
    ("B <-> C", np.array([0.0, -1.0, 1.0, 0.0, 0.0])),
    ("C <-> D", np.array([0.0, 0.0, -1.0, 1.0, 0.0])),
    ("2C <-> D + E", np.array([0.0, 0.0, -2.0, 1.0, 1.0])),
]


def main(p_path, out_dir="runs/case1_rev"):
    import jax
    import jax.numpy as jnp

    from crnn_tpu.cases.case1_rev import Case1RevConfig, build

    cfg = Case1RevConfig()
    setup = build(cfg)
    p = np.load(p_path)
    w = setup.weights_fn(jnp.asarray(p))
    w_out = np.asarray(w.w_out).T            # (nr, ns) reaction rows
    w_k = np.asarray(w.w_b)                  # shared kf=kb log-rates
    rate = np.exp(w_k) * np.abs(w_out).max(axis=1)  # effective magnitude

    mask = jnp.ones((cfg.datasize,), jnp.float32)
    loss_i = setup.trainer.loss_i_exp
    losses = np.asarray(jax.vmap(lambda i: loss_i(p, i, mask))(
        jnp.arange(cfg.n_exp)))
    lt = float(losses[:cfg.n_exp_train].mean())
    lv = float(losses[cfg.n_exp_train:].mean())

    lines = [f"# case1_rev mechanism recovery ({os.path.basename(p_path)})\n",
             f"Loss (MAE/yscale, 0.1% noise): train {lt:.4e} / val {lv:.4e}.\n",
             "Truth: A<->B, B<->C, C<->D, 2C<->D+E, all k=1 "
             "(case1 rev/case1.jl:37-43); Kc=1 tied (w_kb = w_kf, :72-78). "
             "Species order A..E. Reactions sorted by effective rate "
             "exp(w_k)*max|w_out|; a negative cosine is the same reversible "
             "reaction written in the opposite direction (equivalent under "
             "Kc=1).\n",
             "| learned rxn | normalised w_out | exp(w_k) | best true match "
             "| cos |", "|---|---|---|---|---|"]
    matched = {}
    for j in np.argsort(-rate):
        row = w_out[j]
        nrm = np.abs(row).max()
        if nrm < 1e-8:
            continue
        rown = row / nrm
        cos = np.array([row @ v / (np.linalg.norm(row) * np.linalg.norm(v))
                        for _, v in TRUE_RXNS])
        i = int(np.argmax(np.abs(cos)))
        good = abs(cos[i]) > 0.95
        if good and i not in matched:
            matched[i] = j
        mark = "" if good else " (weak)"
        lines.append(f"| r{j+1} | {np.round(rown.astype(np.float64), 3).tolist()} "
                     f"| {np.exp(w_k[j]):.3f} | {TRUE_RXNS[i][0]}{mark} "
                     f"| {cos[i]:+.3f} |")
    lines.append(f"\n**{len(matched)}/4 true reversible reactions matched** "
                 f"(|cos| > 0.95).")
    missing = [TRUE_RXNS[i][0] for i in range(4) if i not in matched]
    if missing:
        lines.append(f"\nUnmatched: {', '.join(missing)}.")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "mechanism_recovery.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(matched)}/4 matched, train {lt:.4e} val {lv:.4e}")


if __name__ == "__main__":
    p_path = sys.argv[1] if len(sys.argv) > 1 else "runs/case1_rev/p_best.npy"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "runs/case1_rev"
    main(p_path, out_dir)

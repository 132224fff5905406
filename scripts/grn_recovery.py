"""GRN mechanism-recovery table: match learned reactions to the 15 true ones.

The truth (gene-regulatory.jl:77-129) is three repressilator gene modules:
per module i: transcription (DNA_i -> DNA_i + mRNA_i), translation
(mRNA_i -> mRNA_i + protein_i), mRNA decay, protein decay, plus three
cyclic regulation reactions (mRNA_i + repressor -> repressor). DNA species
(0,3,6) are frozen (w_out rows zeroed in p2vec, gene-regulatory.jl:44).

Writes runs/grn/mechanism_recovery.md: row-normalised w_out_scale with each
learned reaction matched (cosine over net stoichiometry) to a true
reaction, like runs/case3/mechanism_recovery.md.

Usage: python scripts/grn_recovery.py <p_best.npy> [out_dir]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SPECIES = ["DNA_A", "mRNA_A", "A", "DNA_B", "mRNA_B", "B",
           "DNA_C", "mRNA_C", "C"]


def true_reactions():
    """(name, net stoichiometry over the 9 species). DNA levels are frozen
    in both truth and model, so transcription nets to pure mRNA production."""
    rxns = []
    for i, g in enumerate("ABC"):
        dna, mrna, prot = 3 * i, 3 * i + 1, 3 * i + 2
        v = np.zeros(9); v[mrna] = 1.0
        rxns.append((f"DNA_{g} -> DNA_{g} + mRNA_{g}", v))
        v = np.zeros(9); v[prot] = 1.0
        rxns.append((f"mRNA_{g} -> mRNA_{g} + {g}", v))
        v = np.zeros(9); v[mrna] = -1.0
        rxns.append((f"mRNA_{g} -> 0", v))
        v = np.zeros(9); v[prot] = -1.0
        rxns.append((f"{g} -> 0", v))
    # cyclic regulation: mRNA_C + A -> A; mRNA_B + C -> C; mRNA_A + B -> B
    for mrna, rep in ((7, "A"), (4, "C"), (1, "B")):
        v = np.zeros(9); v[mrna] = -1.0
        rxns.append((f"{SPECIES[mrna]} + {rep} -> {rep}", v))
    return rxns


def main(p_path, out_dir="runs/grn"):
    import jax.numpy as jnp

    from crnn_tpu.cases.case3 import build, grn_config

    cfg = grn_config()
    setup = build(cfg)
    p = np.load(p_path)
    w = setup.weights_fn(jnp.asarray(p))
    w_out = np.asarray(w.w_out)                    # (ns, nr)
    w_in = np.asarray(w.w_in)                      # (ns, nr)
    dydt = np.asarray(setup.dydt_scale).reshape(-1, 1)
    scale = (w_out * dydt).T                       # (nr, ns) reaction rows
    norm = scale / np.abs(scale).max(axis=1, keepdims=True)

    # eval losses at p
    mask = jnp.ones((cfg.datasize,), jnp.float32)
    import jax
    loss_i = setup.trainer.loss_i_exp
    losses = np.asarray(jax.vmap(lambda i: loss_i(p, i, mask))(
        jnp.arange(cfg.n_exp)))
    lt = float(losses[:cfg.n_exp_train].mean())
    lv = float(losses[cfg.n_exp_train:].mean())

    rxns = true_reactions()
    lines = [f"# GRN mechanism recovery ({os.path.basename(p_path)})\n",
             f"Loss (log-MAE, 5% noise): train {lt:.4f} / val {lv:.4f}.\n",
             "Species order: " + ", ".join(SPECIES) + ". DNA rows frozen "
             "(w_out rows 0,3,6 zeroed in p2vec, gene-regulatory.jl:39-50).\n",
             "\n| learned rxn | row-normalised w_out_scale | best true match "
             "| cos | residual L1 |", "|---|---|---|---|---|"]
    matched = set()
    n_clean = 0
    order = np.argsort(-np.abs(scale).max(axis=1))  # strongest first
    for j in order:
        row = norm[j]
        cos = np.array([
            row @ v / (np.linalg.norm(row) * np.linalg.norm(v))
            for _, v in rxns])
        i = int(np.argmax(np.abs(cos)))
        sgn = np.sign(cos[i])
        name, v = rxns[i]
        resid = float(np.abs(sgn * row - v).sum())
        good = abs(cos[i]) > 0.95 and resid < 0.35
        if good:
            matched.add(i)
            n_clean += 1
        mark = "" if good else " (weak)"
        lines.append(
            f"| r{j+1} | {np.round(row.astype(np.float64), 3).tolist()} | {name}{mark} "
            f"| {cos[i]:+.3f} | {resid:.3f} |")
    missing = [rxns[i][0] for i in range(len(rxns)) if i not in matched]
    lines.append(f"\n**{len(matched)}/15 true reactions matched cleanly** "
                 f"(cos > 0.95, residual L1 < 0.35) by {n_clean} learned rows.")
    if missing:
        lines.append(f"\nUnmatched true reactions: {', '.join(missing)}.")
    # pruned evaluation + weights.csv (gene-regulatory-pruning.jl:232-294)
    cfg_pruned = grn_config()
    cfg_pruned.p_cutoff = 0.01
    setup_p = build(cfg_pruned)
    losses_p = np.asarray(jax.vmap(
        lambda i: setup_p.trainer.loss_i_exp(p, i, mask))(
            jnp.arange(cfg.n_exp)))
    lt_p = float(losses_p[:cfg.n_exp_train].mean())
    lv_p = float(losses_p[cfg.n_exp_train:].mean())
    from crnn_tpu.infra.export import export_weights_csv

    export_weights_csv(setup_p.weights_fn(jnp.asarray(p)),
                       os.path.join(out_dir, "weights.csv"),
                       np.asarray(setup_p.dydt_scale))
    lines.append(f"\nPruned (relative cutoff 0.01, "
                 f"gene-regulatory-pruning.jl:243-248): train {lt_p:.4f} / "
                 f"val {lv_p:.4f}; table exported to weights.csv.")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "mechanism_recovery.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {len(matched)}/15 matched, train {lt:.4f} val {lv:.4f}"
          f" (pruned: {lt_p:.4f}/{lv_p:.4f})")


if __name__ == "__main__":
    p_path = sys.argv[1] if len(sys.argv) > 1 else "runs/grn/p_best.npy"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "runs/grn"
    main(p_path, out_dir)

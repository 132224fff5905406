"""Iteration-count convergence check for the SVGD posterior
(round-2 verdict item 8): compare an extended-iteration run against the
round-2 6k-iteration run.

If the posterior is iteration-converged, per-parameter moments and the
correlation structure should agree between the two runs. Writes
convergence.md into the new run's directory.

The third argument states how the two runs are related (continuation vs
independent chain) and is quoted verbatim in the report header — the
round-4 25k run is a FRESH chain warm-started from the deterministic
optimum (reference protocol, UQ network.jl:11-46), not a continuation,
and agreement between independent chains is the stronger check.

Usage: python scripts/uq_compare.py [new_run_dir] [old_run_dir] [relation]
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from uq_summary import NAMES  # noqa: E402


def kendall_tau_matrix(x):
    """Pairwise Kendall-tau over particle columns (n, d) -> (d, d)."""
    n, d = x.shape
    # concordant-discordant counts via sign comparisons (n small: 100)
    s = np.sign(x[:, None, :] - x[None, :, :])          # (n, n, d)
    iu = np.triu_indices(n, 1)
    sp = s[iu]                                          # (pairs, d)
    denom = sp.shape[0]
    return (sp[:, :, None] * sp[:, None, :]).sum(0) / denom


DEFAULT_RELATION = (
    "The extended run CONTINUES from the 6k run's final ensemble under "
    "the reference's annealing cadence (0.95/500, UQ config.yaml:27-33), "
    "so the comparison below measures how much the posterior moves when "
    "the iteration budget is extended — the stability question the "
    "round-2 verdict asked (item 8).")


def main(new_dir="runs/cathode_uq_25k/cathode_uq", old_dir="runs/cathode_uq",
         relation=DEFAULT_RELATION):
    pn = np.load(os.path.join(new_dir, "particles.npy"))
    po = np.load(os.path.join(old_dir, "particles.npy"))
    d = pn.shape[1]
    names = NAMES[:d]

    mn, sn = pn.mean(0), pn.std(0)
    mo, so = po.mean(0), po.std(0)
    dm = np.abs(mn - mo) / np.maximum(np.abs(mo), 1e-12)
    ds = np.abs(sn - so) / np.maximum(so, 1e-12)

    tn, to = kendall_tau_matrix(pn), kendall_tau_matrix(po)
    iu = np.triu_indices(d, 1)
    tau_corr = np.corrcoef(tn[iu], to[iu])[0, 1]

    lines = [
        "# Posterior iteration-count convergence\n",
        f"New run: `{new_dir}` ({pn.shape[0]} particles); "
        f"comparison run: `{old_dir}` ({po.shape[0]} particles). "
        f"{relation}\n",
        "| param | mean 6k | mean ext | rel d-mean | std 6k | std ext | "
        "rel d-std |",
        "|---|---|---|---|---|---|---|",
    ]
    for i, n in enumerate(names):
        lines.append(
            f"| {n} | {mo[i]:.4f} | {mn[i]:.4f} | {dm[i]:.1%} "
            f"| {so[i]:.4f} | {sn[i]:.4f} | {ds[i]:.1%} |")
    lines.append(
        f"\nMedian relative mean shift {np.median(dm):.1%} (max "
        f"{dm.max():.1%}); median relative std shift {np.median(ds):.1%} "
        f"(max {ds.max():.1%}). Kendall-tau correlation structure "
        f"(upper-triangle, {len(iu[0])} pairs) agrees with Pearson r = "
        f"{tau_corr:.3f}.\n")
    out = os.path.join(new_dir, "convergence.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}: med d-mean {np.median(dm):.1%}, med d-std "
          f"{np.median(ds):.1%}, tau-structure r {tau_corr:.3f}")


if __name__ == "__main__":
    main(*sys.argv[1:4])

"""Posterior summary table from a finished cathode_uq run.

Reads runs/cathode_uq/{particles.npy, losses.npz} and writes
posterior_summary.md: per-parameter posterior mean/std in normalised
coordinates (1.0 == deterministic optimum), the tightest/loosest
parameters, and the loss trajectory endpoints — the numeric companion to
the reference's figure-only outputs (post_Plotting.jl:90-199).

Usage: python scripts/uq_summary.py [run_dir]
"""
import os
import sys

import numpy as np

NAMES = ([f"lnA{i}" for i in range(1, 4)] + [f"Ea{i}" for i in range(1, 4)]
         + [f"b{i}" for i in range(1, 4)] + [f"dH{i}" for i in range(1, 4)]
         + [f"n{i}" for i in range(1, 4)] + ["nu2", "nu3"])


def main(run_dir="runs/cathode_uq"):
    particles = np.load(os.path.join(run_dir, "particles.npy"))
    losses = np.load(os.path.join(run_dir, "losses.npz"))
    lt, lv = losses["loss_train"], losses["loss_val"]
    mean, std = particles.mean(axis=0), particles.std(axis=0)
    cv = std / np.abs(mean)
    lines = [
        "# Cathode UQ posterior summary\n",
        f"{particles.shape[0]} particles x {particles.shape[1]} kinetic "
        "parameters (normalised: 1.0 == deterministic optimum "
        "p_opt from the measured-data fit).\n",
        f"Loss: train {lt[0]:.4e} -> {lt[-1]:.4e}, "
        f"val {lv[0]:.4e} -> {lv[-1]:.4e} over {len(lt)} iterations.\n",
        "| param | posterior mean | posterior std | CV |",
        "|---|---|---|---|",
    ]
    for i, n in enumerate(NAMES[: particles.shape[1]]):
        lines.append(f"| {n} | {mean[i]:.4f} | {std[i]:.4f} | {cv[i]:.4f} |")
    order = np.argsort(cv)
    lines.append(
        f"\nTightest-constrained: {', '.join(NAMES[i] for i in order[:3])}; "
        f"loosest: {', '.join(NAMES[i] for i in order[-3:])}. "
        "(The reference's qualitative finding — lnA/Ea strongly correlated "
        "and jointly constrained, reaction orders loosest — is checked in "
        "corr.png/hist.png.)")
    out = os.path.join(run_dir, "posterior_summary.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "runs/cathode_uq")

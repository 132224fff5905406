"""Held-out evaluation + overlay figures for a yeast hybrid champion.

Loads a params npz (tree leaves in init_params order, as saved by
run_case / yeast_lm / the hunt harness), integrates every experiment at
max_steps=1024, and writes:
  - per-experiment overlay figures for the 10 held-out experiments
    (reference's demonstrated artifact: yeast-glycolysis/readme.md:27-33);
  - a markdown table of per-species and per-split MAE.

Usage: python scripts/yeast_eval.py --params runs/yeast_hunt/p_opt_lm.npz \
           --mlp-width 16 --out runs/yeast_hunt/eval_w16
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", required=True)
    ap.add_argument("--mlp-width", type=int, default=0)
    ap.add_argument("--max-steps", type=int, default=1024)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from crnn_tpu.cases.yeast import YeastConfig, build
    from crnn_tpu.infra.plotting import plot_experiment

    cfg = YeastConfig(max_steps=args.max_steps, mlp_width=args.mlp_width)
    setup = build(cfg)
    ds = setup.dataset

    loaded = np.load(args.params)
    leaves = [jnp.asarray(loaded[k]) for k in loaded.files]
    treedef = jax.tree_util.tree_structure(setup.init_params)
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    species = setup.species or [f"y{j+1}" for j in range(cfg.ns)]
    os.makedirs(args.out, exist_ok=True)
    predict = jax.jit(setup.predict)
    abserr = np.zeros((cfg.n_exp, cfg.ns))
    for i in range(cfg.n_exp):
        pred = np.asarray(predict(params, jnp.asarray(i)))
        truth = np.asarray(ds.ys[i])
        abserr[i] = np.abs(pred - truth).mean(axis=0)
        if i >= cfg.n_exp_train:  # held-out overlays only
            plot_experiment(ds.ts, truth, pred,
                            os.path.join(args.out, f"val_exp_{i}.png"),
                            species=species)

    tr, va = abserr[:cfg.n_exp_train], abserr[cfg.n_exp_train:]
    lines = [
        "# Yeast hybrid held-out evaluation",
        "",
        f"params: `{args.params}` (mlp width {args.mlp_width or 5}, "
        f"max_steps {args.max_steps})",
        "",
        f"**train MAE {tr.mean():.4e} | val MAE {va.mean():.4e}** "
        f"({cfg.n_exp_train} train / {cfg.n_exp - cfg.n_exp_train} "
        "held-out experiments)",
        "",
        "## Per-species val MAE (mean abs error over the 10 held-out "
        "experiments, full 5 s horizon)",
        "",
        "| species | val MAE | train MAE |",
        "|---|---|---|",
    ]
    for j, sp in enumerate(species[:cfg.ns]):
        lines.append(f"| {sp} | {va[:, j].mean():.4e} | "
                     f"{tr[:, j].mean():.4e} |")
    lines += ["", "Overlay figures: `val_exp_*.png` (one per held-out "
              "experiment, all 7 observed species)."]
    with open(os.path.join(args.out, "eval.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines), flush=True)


if __name__ == "__main__":
    main()

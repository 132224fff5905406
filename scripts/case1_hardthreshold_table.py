"""case1_hardthreshhold artifact: prune -> eval -> fine-tune table.

Reproduces the reference flow (case1/case1_hardthreshhold.jl:196-238):
load the trained case1 parameters, hard-threshold |w_out| entries below
p_cutoff (their p_cutoff = 0.01), evaluate the pruned model, fine-tune
at low lr, and report the table. The reference's "fine tuning" loop has
its update commented out (case1_hardthreshhold.jl:224 '# update!'), so
its table is prune+eval only; we run a real masked fine-tune as well.

Usage:
  python scripts/case1_hardthreshold_table.py [--run runs/case1_hardthreshold]
Reads  <run>/case1/p_opt.npy (from `python -m crnn_tpu.cases.case1`),
writes <run>/prune_table.md (+ fine-tune artifacts under <run>/case1_pruned/).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="runs/case1_hardthreshold")
    ap.add_argument("--cutoffs", default="0.005,0.01,0.02,0.05")
    ap.add_argument("--finetune-cutoff", type=float, default=0.01)
    ap.add_argument("--finetune-epochs", type=int, default=400)
    ap.add_argument("--finetune-lr", type=float, default=1e-4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from crnn_tpu.cases.base import run_case
    from crnn_tpu.cases.case1 import Case1Config, build
    from crnn_tpu.transforms.pruning import prune_case2_params

    p_opt = np.load(os.path.join(args.run, "case1", "p_opt.npy"))
    cfg = Case1Config()
    setup = build(cfg)
    loss_i = setup.trainer.loss_i_exp_eval
    mask = jnp.ones((setup.trainer.n_save,))

    def losses(p):
        p = jnp.asarray(p)
        all_l = jax.vmap(lambda i: loss_i(p, i, mask))(
            jnp.arange(setup.trainer.n_exp))
        tr = float(jnp.mean(all_l[: setup.trainer.n_exp_train]))
        va = float(jnp.mean(all_l[setup.trainer.n_exp_train:]))
        return tr, va

    def nnz(p, cutoff):
        w = setup.weights_fn(jnp.asarray(p))
        return int(np.sum(np.abs(np.asarray(w.w_out)) >= cutoff))

    rows = []
    tr0, va0 = losses(p_opt)
    total = int(np.asarray(setup.weights_fn(jnp.asarray(p_opt)).w_out).size)
    rows.append(("none", tr0, va0, total))
    for c in [float(x) for x in args.cutoffs.split(",")]:
        p_pr = prune_case2_params(jnp.asarray(p_opt), cfg.ns, cfg.nr, c)
        tr, va = losses(p_pr)
        rows.append((f"{c:g}", tr, va, nnz(p_pr, 1e-12)))

    # ---- real masked fine-tune at the reference's cutoff -----------------
    import dataclasses

    ft_cfg = Case1Config(p_cutoff=args.finetune_cutoff, lr=args.finetune_lr)
    ft_setup = dataclasses.replace(build(ft_cfg), name="case1_pruned",
                                   init_params=jnp.asarray(p_opt))
    state, info = run_case(ft_setup, n_epoch=args.finetune_epochs,
                           out_dir=args.run, n_plot=args.finetune_epochs)
    lv = np.asarray(info["loss_val"], float)
    lt = np.asarray(info["loss_train"], float)
    i_best = int(np.nanargmin(lv))
    ft_tr, ft_va = float(lt[i_best]), float(lv[i_best])

    md = os.path.join(args.run, "prune_table.md")
    with open(md, "w") as f:
        f.write("# case1 hard-threshold pruning (case1_hardthreshhold.jl"
                ":196-238)\n\n")
        f.write(f"Base run: {args.run}/case1 (3000 epochs, best-val "
                f"params). w_out total entries: {total}.\n\n")
        f.write("| p_cutoff | train | val | nonzero w_out |\n|---|---|---|---|\n")
        for c, tr, va, n in rows:
            f.write(f"| {c} | {tr:.4e} | {va:.4e} | {n} |\n")
        f.write(f"\nFine-tune at p_cutoff={args.finetune_cutoff:g} "
                f"(lr {args.finetune_lr:g}, {args.finetune_epochs} epochs, "
                f"masked weights_fn): train {ft_tr:.4e} val {ft_va:.4e} "
                f"(artifacts in {args.run}/case1_pruned/).\n")
        f.write("\nNote: the reference evaluates the pruned model and runs "
                "a fine-tuning loop whose parameter update is commented "
                "out; the real masked fine-tune here is the framework "
                "extension of the same flow.\n")
    print(f"wrote {md}")
    for r in rows:
        print(r)
    print("fine-tuned:", ft_tr, ft_va)


if __name__ == "__main__":
    main()

"""GRN low-lr polish: sharpen the 15th reaction (VERDICT r3 missing #5).

runs/grn/p_best.npy recovers 14/15 true reactions; the missing one
(DNA_C -> DNA_C + mRNA_C transcription) exists as a CONTAMINATED channel
(learned r3 matches it at cos 0.615 with A/C cross-terms). The case1_rev
truth-init control (runs/case1_rev/mechanism_recovery.md, round 4) showed
Adam step noise at lr >= 1e-3 actively blurs narrow basins; hypothesis:
the 160k-epoch run's floor lr was still too hot to let the weak
transcription channel settle onto its axis.

Protocol: continue from p_best at constant low lr (default 1e-4, then an
optional 5e-5 stage), best-val tracked by the generic guarded runner,
then rewrite the recovery table with scripts/grn_recovery.py against the
polished params. Truth: gene-regulatory.jl:77-129.

Usage: python scripts/grn_polish.py [--epochs 20000] [--lr 1e-4]
           [--p runs/grn/p_best.npy] [--out runs/grn_polish]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lr2", type=float, default=5e-5,
                    help="second-stage lr (0 disables the stage)")
    ap.add_argument("--epochs2", type=int, default=10000)
    ap.add_argument("--p", default="runs/grn/p_best.npy")
    ap.add_argument("--out", default="runs/grn_polish")
    args = ap.parse_args()

    import jax.numpy as jnp

    from crnn_tpu.cases.base import run_case
    from crnn_tpu.cases.case3 import build, grn_config

    p = np.load(args.p)
    stages = [(args.lr, args.epochs)]
    if args.lr2 > 0 and args.epochs2 > 0:
        stages.append((args.lr2, args.epochs2))

    for i, (lr, n) in enumerate(stages):
        cfg = grn_config()
        cfg.lr = lr
        cfg.lr_decay_steps = 0        # constant: the point is a cold polish
        setup = build(cfg)
        setup.init_params = jnp.asarray(p)
        print(f"[grn_polish] stage {i}: lr={lr:g} epochs={n}", flush=True)
        run_case(setup, n_epoch=n, out_dir=args.out)
        best = os.path.join(args.out, "grn", "p_opt.npy")
        if os.path.exists(best):
            p = np.load(best)

    out_dir = os.path.join(args.out, "grn")
    np.save(os.path.join(out_dir, "p_polish.npy"), p)
    os.system(f"{sys.executable} scripts/grn_recovery.py "
              f"{os.path.join(out_dir, 'p_polish.npy')} {out_dir}")
    print(f"[grn_polish] recovery table -> {out_dir}/mechanism_recovery.md",
          flush=True)


if __name__ == "__main__":
    main()

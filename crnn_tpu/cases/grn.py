"""gene-regulatory-network: first-class case entry point.

The GRN oscillator (reference: gene-regulatory.jl — nr=15 mass-action
reactions over 9 species with frozen DNA rows, 1% noise, ADAMW, stochastic
truncation) shares its entire build with case3 (`case3.grn_config()`);
this module gives it its own CLI/`crnn-tpu grn` identity with the
long-run defaults that recovered 14/15 reactions (runs/grn): staircase lr
decay every 20k epochs (the reference's manual restart-with-lower-lr
workflow, gene-regulatory.jl:15 is_restart=true, automated) — best-val
parameter tracking is built into the generic runner (cases/base.py).
"""

from __future__ import annotations

from crnn_tpu.cases.base import run_case
from crnn_tpu.cases.case3 import Case3Config, build, grn_config

__all__ = ["Case3Config", "build", "grn_config"]


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=160000)
    ap.add_argument("--mode", default="batch")
    ap.add_argument("--p-cutoff", type=float, default=0.0)
    ap.add_argument("--lr-decay-steps", type=int, default=20000,
                    help="staircase lr halving period (0 = constant lr; "
                         "constant 1e-3 diverges at ~80k epochs)")
    ap.add_argument("--restart", action="store_true")
    ap.add_argument("--out", default="runs")
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel over N devices (-1 = all)")
    args = ap.parse_args()
    cfg = grn_config()
    cfg.mode = args.mode
    cfg.p_cutoff = args.p_cutoff
    cfg.lr_decay_steps = args.lr_decay_steps
    setup = build(cfg)
    run_case(setup, n_epoch=args.epochs, out_dir=args.out,
             restart=args.restart, dp=args.dp)

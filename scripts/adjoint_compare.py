"""Continuous adjoint vs checkpointed reverse-scan at case scale
(VERDICT round-2 item 9): robertson, the 10^5-second horizon.

Measures per-epoch wall-clock and peak device memory for the two gradient
paths and writes the table into docs/DESIGN.md.

Run on TPU: python scripts/adjoint_compare.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(grad_path, n_iters=5):
    import jax

    from crnn_tpu.cases.robertson import RobertsonConfig, build

    setup = build(RobertsonConfig(grad_path=grad_path))
    st = setup.trainer.init(setup.init_params)
    step = setup.trainer.epoch_fn()
    st, m = step(st)
    m.loss_train.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n_iters):
        st, m = step(st)
    m.loss_train.block_until_ready()
    ms = (time.perf_counter() - t0) / n_iters * 1e3
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use", 0) / 1e6
    except Exception:
        peak = float("nan")
    return ms, peak, float(m.loss_train), float(m.grad_norm)


def main():
    rows = []
    for gp in ("rev_scan", "adjoint"):
        ms, peak, loss, gnorm = measure(gp)
        rows.append((gp, ms, peak, loss, gnorm))
        print(f"{gp}: {ms:.1f} ms/epoch, peak {peak:.1f} MB, "
              f"loss {loss:.3e}, gnorm {gnorm:.3e}", flush=True)

    lines = [
        "\n### Continuous adjoint vs checkpointed reverse-scan "
        "(robertson, 10^5 s horizon, TPU v5e-1)\n",
        "| grad path | ms/epoch | peak device MB | loss after warmup | grad norm |",
        "|---|---|---|---|---|",
    ]
    for gp, ms, peak, loss, gnorm in rows:
        lines.append(f"| {gp} | {ms:.1f} | {peak:.1f} | {loss:.3e} "
                     f"| {gnorm:.3e} |")
    lines.append(
        "\nThe backsolve adjoint (`RobertsonConfig(grad_path='adjoint')`, "
        "ode/adjoint.py) carries O(n_save) checkpoints instead of the "
        "remat scan's O(max_steps) saved carries; on the strongly stiff "
        "Robertson horizon the backward re-integration costs extra solver "
        "steps, so it trades wall-clock for memory exactly as "
        "BacksolveAdjoint(checkpointing=true) does in the reference "
        "(case2/case2.jl:123, yeast_glycolysis.jl:148).")
    with open("docs/DESIGN.md", "a") as f:
        f.write("\n".join(lines) + "\n")
    print("appended table to docs/DESIGN.md", flush=True)


if __name__ == "__main__":
    main()

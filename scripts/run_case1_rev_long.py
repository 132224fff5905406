"""case1_rev staged-lr training to the noise floor + recovery table.

Round-2: with the faithful config (tspan 10, noise 1e-3 — see
Case1RevConfig), batch mode passes val 0.024 in 1k epochs and plateaus
~0.014 at lr 1e-3; the lr stages push to the noise floor the way the
reference's 1M-epoch ADAMW(1e-4) run would (case1 rev/case1.jl:17-19).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax.numpy as jnp

from crnn_tpu.cases.case1_rev import Case1RevConfig, build

OUT = os.environ.get("C1R_OUT", "runs/case1_rev")
os.makedirs(OUT, exist_ok=True)
stages = [
    (float(s.split(":")[0]), int(s.split(":")[1]))
    for s in os.environ.get(
        "C1R_STAGES", "1e-3:30000,3e-4:30000,1e-4:40000").split(",")
]

p = None
for lr, n in stages:
    setup = build(Case1RevConfig(mode="batch", lr=lr))
    state = setup.trainer.init(
        setup.init_params if p is None else jnp.asarray(p))
    step = setup.trainer.epoch_fn()
    best = (np.inf, np.asarray(state.params))
    t0 = time.time()
    for e in range(n):
        state, m = step(state)
        if e % 50 == 0:
            lv = float(m.loss_val)
            if np.isfinite(lv) and lv < best[0]:
                best = (lv, np.asarray(state.params))
            if e % 5000 == 0:
                print(f"[lr={lr:g}] {e} train {float(m.loss_train):.4e} "
                      f"val {lv:.4e} best {best[0]:.4e}", flush=True)
    lv = float(m.loss_val)
    if np.isfinite(lv) and lv < best[0]:
        best = (lv, np.asarray(state.params))
    print(f"[lr={lr:g}] {n} epochs in {time.time()-t0:.0f}s; "
          f"best val {best[0]:.4e}", flush=True)
    p = best[1]
    np.save(os.path.join(OUT, "p_best.npy"), p)

from case1_rev_recovery import main as recovery_main  # noqa: E402

recovery_main(os.path.join(OUT, "p_best.npy"), OUT)
print("DONE", flush=True)

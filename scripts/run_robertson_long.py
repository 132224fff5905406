"""Robertson staged-lr long training -> f64 LM polish -> parity table.

The reference trains with constant ADAMW 5e-3 for up to 1e6 epochs with
manual lower-lr restarts (rober_crnn.jl:16-19,209). Here: staged lr drops
with best-val tracking, bulk epochs optionally in f32 (TPU-native; see
runs/robertson_long/f32_experiment.md), then an f64 polish + LM finish,
then scripts/robertson_parity.py writes the numeric comparison against the
published converged table (robertson/ReadMe.md:15-36).

Env: ROBERTSON_DTYPE (float32), ROBERTSON_STAGES ("5e-3:30000,1e-3:20000,2e-4:15000")
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax.numpy as jnp

from crnn_tpu.cases.robertson import RobertsonConfig, build, run_lm_finish
from crnn_tpu.infra.plotting import display_weights

OUT = "runs/robertson_long"
os.makedirs(OUT, exist_ok=True)
dtype = os.environ.get("ROBERTSON_DTYPE", "float32")
stages = [
    (float(s.split(":")[0]), int(s.split(":")[1]))
    for s in os.environ.get(
        "ROBERTSON_STAGES", "5e-3:30000,1e-3:20000,2e-4:15000").split(",")
]


def train_stage(setup, p0, n_epochs, tag):
    state = setup.trainer.init(jnp.asarray(p0))
    step = setup.trainer.epoch_fn()
    best = (np.inf, np.asarray(p0))
    t0 = time.time()
    for e in range(n_epochs):
        state, m = step(state)
        if e % 50 == 0:
            lv = float(m.loss_val)
            if np.isfinite(lv) and lv < best[0]:
                best = (lv, np.asarray(state.params))
            if e % 2000 == 0:
                print(f"[{tag}] {e} train {float(m.loss_train):.4e} "
                      f"val {lv:.4e} best {best[0]:.4e}", flush=True)
    lv = float(m.loss_val)
    if np.isfinite(lv) and lv < best[0]:
        best = (lv, np.asarray(state.params))
    print(f"[{tag}] {n_epochs} epochs in {time.time()-t0:.0f}s; "
          f"best val {best[0]:.4e}", flush=True)
    return best


p = None
best_val = np.inf
for lr, n in stages:
    setup = build(RobertsonConfig(mode="batch", lr=lr, dtype=dtype))
    p0 = setup.init_params if p is None else jnp.asarray(p, setup.init_params.dtype)
    best_val, p = train_stage(setup, p0, n, f"{dtype} lr={lr:g}")
    np.save(os.path.join(OUT, "p_stage.npy"), p)

# f64 polish stage + LM finish
setup64 = build(RobertsonConfig(mode="batch", lr=1e-4, dtype="float64"))
best_val, p = train_stage(setup64, jnp.asarray(p, jnp.float64), 4000,
                          "f64 polish lr=1e-4")
np.save(os.path.join(OUT, "p_adam.npy"), p)

p_fit, info = run_lm_finish(setup64, jnp.asarray(p, jnp.float64), max_iters=80)
print("LM cost:", info["cost"], "converged:", info["converged"], flush=True)
np.save(os.path.join(OUT, "p_final.npy"), np.asarray(p_fit))

w = setup64.weights_fn(jnp.asarray(p_fit))
display_weights(w, setup64.dydt_scale)
print("slope =", float(np.abs(np.asarray(p_fit))[-1]), flush=True)

from robertson_parity import main as parity_main  # noqa: E402

parity_main(os.path.join(OUT, "p_final.npy"), os.path.join(OUT, "parity.md"))
print("DONE", flush=True)

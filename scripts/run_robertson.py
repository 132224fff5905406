"""Robertson long training + LM polish: the BASELINE.md quality target.

The reference publishes a converged 6-reaction weight table
(robertson/ReadMe.md:15-36) as its only quantitative outcome; this run
produces the equivalent table (row-normalised w_out scale + slope).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from crnn_tpu.cases.robertson import RobertsonConfig, build, run_lm_finish
from crnn_tpu.infra.plotting import display_weights

cfg = RobertsonConfig(mode="batch", lr=5e-3)
setup = build(cfg)
state = setup.trainer.init(setup.init_params)
step = setup.trainer.epoch_fn()
best = (np.inf, None)
t0 = time.time()
N = int(os.environ.get("ROBERTSON_EPOCHS", 8000))
for e in range(N):
    state, m = step(state)
    if e % 100 == 0:
        lv = float(m.loss_val)
        if lv < best[0]:
            best = (lv, np.asarray(state.params))
        if e % 300 == 0:
            print(e, float(m.loss_train), lv, f"gnorm {float(m.grad_norm):.2e}",
                  flush=True)
print(f"{N} epochs in {time.time()-t0:.0f}s; best val {best[0]:.4e}", flush=True)
p = best[1] if best[1] is not None else np.asarray(state.params)
np.save("/tmp/robertson_p_adam.npy", p)  # persist before the LM phase

# LM polish on the training residuals (rober_crnn_lm.jl:249-253)
import jax.numpy as jnp

p_fit, info = run_lm_finish(setup, jnp.asarray(p), max_iters=50)
print("LM cost:", info["cost"], "converged:", info["converged"], flush=True)

w = setup.weights_fn(jnp.asarray(p_fit))
display_weights(w, setup.dydt_scale)
print("slope =", float(np.abs(np.asarray(p_fit))[-1]), flush=True)
np.save("/tmp/robertson_p.npy", np.asarray(p_fit))
print("DONE", flush=True)

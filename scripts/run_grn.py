"""GRN long training with staircase lr decay + best-val tracking.

Target: full recovery of the 15-reaction gene-regulatory network
(gene-regulatory.jl:77-129) the way case3 recovers the MAPK cascade.
Round-1 finding: constant lr 1e-3 diverges at ~80k epochs; the schedule
automates the reference's manual restart-with-lower-lr workflow
(gene-regulatory.jl:15 is_restart=true).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from crnn_tpu.cases.case3 import grn_config, build
from crnn_tpu.infra.plotting import display_weights

cfg = grn_config()
cfg.lr_decay_steps = int(os.environ.get("GRN_DECAY_STEPS", 20000))
cfg.lr_decay = 0.5
cfg.lr_floor = 1e-5
setup = build(cfg)
state = setup.trainer.init(setup.init_params)
step = setup.trainer.epoch_fn()
best = (np.inf, None)
t0 = time.time()
N = int(os.environ.get("GRN_EPOCHS", 160000))
out = os.environ.get("GRN_OUT", "runs/grn")
os.makedirs(out, exist_ok=True)
for e in range(N):
    state, m = step(state)
    if e % 100 == 0:
        lv = float(m.loss_val)
        if np.isfinite(lv) and lv < best[0]:
            best = (lv, np.asarray(state.params))
        if e % 2000 == 0:
            print(e, float(m.loss_train), lv, f"best {best[0]:.4e}", flush=True)
            np.save(os.path.join(out, "p_best.npy"), best[1])
print(f"{N} epochs in {time.time()-t0:.0f}s; best val {best[0]:.4e}", flush=True)
np.save(os.path.join(out, "p_best.npy"), best[1])

import jax.numpy as jnp

w = setup.weights_fn(jnp.asarray(best[1]))
display_weights(w, setup.dydt_scale)
print("DONE", flush=True)

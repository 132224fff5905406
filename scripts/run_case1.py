"""Convergence validation run for case1 (mechanism recovery check)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from crnn_tpu.cases.case1 import Case1Config, build
from crnn_tpu.infra.plotting import display_weights

setup = build(Case1Config(lr=5e-3, lr_decay=0.5, lr_decay_epochs=3000,
                          lr_floor=2e-4, grad_max=2.0))
state = setup.trainer.init(setup.init_params)
step = setup.trainer.epoch_fn()
best_val, best_p = np.inf, None
t0 = time.time()
for e in range(20000):
    state, m = step(state)
    if e % 500 == 0:
        lv = float(m.loss_val)
        if lv < best_val:
            best_val, best_p = lv, np.asarray(state.params)
        if e % 2000 == 0:
            print(e, float(m.loss_train), lv, flush=True)
print("20000 epochs in", time.time() - t0, "s; final",
      float(m.loss_train), float(m.loss_val), "best_val", best_val, flush=True)
display_weights(setup.weights_fn(best_p if best_p is not None else state.params))
np.save("/tmp/case1_p.npy", best_p)
print("DONE", flush=True)

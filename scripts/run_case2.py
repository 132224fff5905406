"""Convergence validation for case2: recover Arrhenius logA/Ea/stoichiometry."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from crnn_tpu.cases.case2 import Case2Config, build
from crnn_tpu.infra.plotting import display_weights

cfg = Case2Config(mode="batch", solver="rosenbrock23",
                  lr0=5e-3, lr_decay=0.5, lr_decay_epochs=5000,
                  lr_floor=2e-4)
setup = build(cfg)
state = setup.trainer.init(setup.init_params)
step = setup.trainer.epoch_fn()
best_val, best_p = np.inf, None
t0 = time.time()
N = 25000
for e in range(N):
    state, m = step(state)
    if e % 250 == 0:
        lv = float(m.loss_val)
        if lv < best_val:
            best_val, best_p = lv, np.asarray(state.params)
        if e % 2500 == 0:
            print(e, float(m.loss_train), lv, flush=True)
print(f"{N} epochs in", time.time() - t0, "s; final",
      float(m.loss_train), float(m.loss_val), "best_val", best_val, flush=True)
p_show = best_p if best_p is not None else np.asarray(state.params)
w = setup.weights_fn(p_show)
display_weights(w)
# Arrhenius readout: for reaction j, rate = exp(w_b_j - Ea_j/(R T)) with
# w_b = ln A and the Ea row of w_in (truth: logA=[18.6,19.13,7.93] ln-units?
# reference logA is ln A; Ea in kcal/mol = w_in_Ea)
print("learned lnA:", np.round(np.asarray(w.w_b), 3))
print("learned Ea :", np.round(np.asarray(w.w_in)[-1], 3))
print("truth   lnA: [18.60 19.13  7.93]")
print("truth   Ea : [14.54 14.42  6.47]")
np.save("/tmp/case2_p.npy", p_show)
print("DONE", flush=True)

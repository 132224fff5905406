"""Convergence validation run for case1 (mechanism recovery check)."""
import time

import numpy as np

from crnn_tpu.cases.case1 import Case1Config, build
from crnn_tpu.infra.plotting import display_weights

setup = build(Case1Config(lr=5e-3))
state = setup.trainer.init(setup.init_params)
step = setup.trainer.epoch_fn()
t0 = time.time()
for e in range(20000):
    state, m = step(state)
    if e % 2000 == 0:
        print(e, float(m.loss_train), float(m.loss_val), flush=True)
m.loss_train.block_until_ready()
print("20000 epochs in", time.time() - t0, "s; final",
      float(m.loss_train), float(m.loss_val), flush=True)
display_weights(setup.weights_fn(state.params))
np.save("/tmp/case1_p.npy", np.asarray(state.params))
print("DONE", flush=True)

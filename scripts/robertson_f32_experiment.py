"""Robertson f32-vs-f64 experiment (round-2 item: PROGRESS.md round-1 gap).

The reference runs Robertson in Float64 (rober_crnn.jl:40). On TPU f64 is
double-float emulation (~6x VPU cost); this experiment measures what f32
actually costs in accuracy: epoch wall-clock, loss parity, and gradient
parity at identical parameters. Writes runs/robertson_long/f32_experiment.md.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

from crnn_tpu.cases.robertson import RobertsonConfig, build

import jax
import jax.numpy as jnp


def time_epochs(setup, n=20):
    state = setup.trainer.init(setup.init_params)
    step = setup.trainer.epoch_fn()
    state, m = step(state)
    m.loss_train.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state)
    m.loss_train.block_until_ready()
    return (time.perf_counter() - t0) / n * 1000.0


rows = []
setups = {}
for dt in ("float64", "float32"):
    cfg = RobertsonConfig(dtype=dt)
    setup = build(cfg)
    setups[dt] = setup
    ms = time_epochs(setup)
    rows.append((dt, ms))
    print(f"{dt}: {ms:.1f} ms/epoch", flush=True)

# gradient parity at identical params (the f64 init, cast down)
s64, s32 = setups["float64"], setups["float32"]
p64 = jnp.asarray(s64.init_params)
p32 = p64.astype(jnp.float32)
mask64 = jnp.ones((40,), jnp.float64)
mask32 = jnp.ones((40,), jnp.float32)
g64 = jax.jit(jax.grad(lambda p: s64.extras["loss_i_exp"](p, 0, mask64)))(p64)
g32 = jax.jit(jax.grad(lambda p: s32.extras["loss_i_exp"](p, 0, mask32)))(p32)
l64 = float(s64.extras["loss_i_exp"](p64, 0, mask64))
l32 = float(s32.extras["loss_i_exp"](p32, 0, mask32))
g64n, g32n = np.asarray(g64), np.asarray(g32, np.float64)
cos = float(np.dot(g64n, g32n) / (np.linalg.norm(g64n) * np.linalg.norm(g32n)))
rel = float(np.linalg.norm(g64n - g32n) / np.linalg.norm(g64n))
print(f"loss: f64 {l64:.8f} f32 {l32:.8f}  grad cos {cos:.6f} relerr {rel:.3e}",
      flush=True)

# short training-dynamics comparison: 2000 epochs each from the same init
dyn = {}
for dt, setup in setups.items():
    state = setup.trainer.init(setup.init_params)
    step = setup.trainer.epoch_fn()
    best = np.inf
    for e in range(2000):
        state, m = step(state)
        if e % 50 == 0:
            lv = float(m.loss_val)
            if np.isfinite(lv):
                best = min(best, lv)
    dyn[dt] = best
    print(f"{dt}: best val after 2000 epochs = {best:.4e}", flush=True)

out = "runs/robertson_long"
os.makedirs(out, exist_ok=True)
with open(os.path.join(out, "f32_experiment.md"), "w") as f:
    f.write("# Robertson f32 vs f64 on TPU v5e\n\n")
    f.write("The reference runs this case in Float64 (rober_crnn.jl:40); on "
            "TPU f64 is double-float emulation. Same seed, same data "
            "(truth always generated in f64 at rtol 1e-8 and cast).\n\n")
    f.write("| dtype | epoch (ms) | loss@init (exp 0) | best val @2k epochs |\n")
    f.write("|---|---|---|---|\n")
    for dt, ms in rows:
        l = l64 if dt == "float64" else l32
        f.write(f"| {dt} | {ms:.1f} | {l:.8f} | {dyn[dt]:.4e} |\n")
    f.write(f"\nGradient parity at identical params: cosine {cos:.6f}, "
            f"relative L2 error {rel:.3e} (FD-parity for f64 is rtol 1e-5, "
            f"tests/test_gradients.py).\n")
    sp = rows[0][1] / rows[1][1]
    f.write(f"\nSpeedup f64 -> f32: {sp:.2f}x per epoch.\n")
print("WROTE f32_experiment.md", flush=True)

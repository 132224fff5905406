"""Perf sweep on the TPU: case2 epoch variants + Pallas kernel crossover."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import jax
import jax.numpy as jnp


def time_fn(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_case2(solver_name):
    from crnn_tpu.cases.case2 import Case2Config, build

    cfg = Case2Config(mode="batch", solver=solver_name)
    setup = build(cfg)
    state = setup.trainer.init(setup.init_params)
    step = setup.trainer.epoch_fn()
    t0 = time.time()
    state, m = step(state)
    m.loss_train.block_until_ready()
    compile_s = time.time() - t0

    def run(state):
        s, m = step(state)
        return m.loss_train

    dt = time_fn(lambda s: step(s)[1].loss_train, state, iters=20)
    print(f"case2[{solver_name}]: epoch {dt*1e3:.2f} ms (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def bench_pallas():
    from crnn_tpu.ops.crnn_kernels import (
        _rhs_pallas, crnn_rhs_batched_reference,
    )

    ns, nr = 8, 8
    key = jax.random.PRNGKey(0)
    w_in = jnp.clip(jax.random.normal(key, (ns, nr)), 0, 2.5)
    w_b = jax.random.normal(key, (nr,)) - 1.0
    w_out = jax.random.normal(key, (ns, nr))
    ref_jit = jax.jit(lambda y: crnn_rhs_batched_reference(y, w_in, w_b, w_out, 1e-5, 10.0))
    for b in (64, 512, 4096, 32768):
        y = jnp.abs(jax.random.normal(key, (b, ns))) + 0.05
        t_ref = time_fn(ref_jit, y, iters=50)
        t_pal = time_fn(
            lambda yy: _rhs_pallas(yy, w_in, w_b, w_out, 1e-5, 10.0), y, iters=50
        )
        print(f"rhs batch={b}: xla {t_ref*1e6:.0f}us pallas {t_pal*1e6:.0f}us",
              flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    bench_pallas()
    bench_case2("rosenbrock23")
    bench_case2("auto_tsit5_rosenbrock23")

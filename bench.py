"""Benchmark: case2 batched stiff solve+adjoint per-epoch wall-clock.

Workload (BASELINE.md): case2 = 30 experiments x 50 timesteps, ns=6+T,
nr=3, stiff-capable solve, full gradient through the solver — one epoch =
gradient step over the 20 training experiments + loss evaluation of all 30
experiments (exactly the reference's per-epoch work, case2/case2.jl:192-207).

The reference publishes no timings (SURVEY.md §6) and Julia is not
installed in this environment (see BASELINE.md), so the recorded
``vs_baseline`` is the measured speedup of the TPU-native batched epoch
over the reference's *execution pattern* — serial experiment-by-experiment
dispatch of the same jitted solve+grad on the same chip. This isolates the
framework's core claim (vmapped batching of the training loop).

Because the batched epoch performs ONE optimizer update where the
reference performs twenty, the line also reports the update-count-matched
comparison: ``sequential_ms`` is the framework's reference-faithful
sequential mode (20 per-experiment updates per epoch inside one jitted
lax.scan) and ``vs_serial_seq`` is serial-dispatch / sequential — the
honest apples-to-apples dispatch-pattern speedup.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"sequential_ms", "serial_dispatch_ms", "vs_serial_seq"}.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from crnn_tpu.cases.case2 import Case2Config, build

    # fastest framework path: batch-major Rosenbrock with the rank-nr
    # Woodbury W-solve (ode/batch_solve.py) — 8.7 ms vs 20.7 ms for the
    # dense per-lane path on TPU v5e (round-2 measurement)
    cfg = Case2Config(mode="batch", solver="rosenbrock23",
                      batch_major=True, jac_mode="lowrank")
    setup = build(cfg)
    trainer = setup.trainer
    state = trainer.init(setup.init_params)
    step = trainer.epoch_fn()

    # --- batched epoch (the framework path) -------------------------------
    state, m = step(state)  # compile
    m.loss_train.block_until_ready()
    n_iters = 30
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = step(state)
    m.loss_train.block_until_ready()
    batched_s = (time.perf_counter() - t0) / n_iters

    # --- sequential mode: reference-faithful 20 updates/epoch, one jitted
    #     lax.scan over experiments (update-count-matched to the reference) --
    cfg_seq = Case2Config(mode="sequential", solver="rosenbrock23")
    setup_seq = build(cfg_seq)
    state_seq = setup_seq.trainer.init(setup_seq.init_params)
    step_seq = setup_seq.trainer.epoch_fn()
    state_seq, m_seq = step_seq(state_seq)  # compile
    m_seq.loss_train.block_until_ready()
    n_seq = 10
    t0 = time.perf_counter()
    for _ in range(n_seq):
        state_seq, m_seq = step_seq(state_seq)
    m_seq.loss_train.block_until_ready()
    sequential_s = (time.perf_counter() - t0) / n_seq

    # --- serial per-experiment pattern (the reference's loop shape) -------
    ds = setup.dataset
    import optax

    loss_i = trainer.loss_i_exp
    grad_i = jax.jit(jax.grad(loss_i))
    loss_j = jax.jit(loss_i)
    mask = jnp.ones((cfg.datasize,), ds.ys.dtype)
    optimizer = trainer.optimizer
    p = setup.init_params
    opt_state = optimizer.init(p)
    # compile both
    grad_i(p, jnp.asarray(0), mask)[0].block_until_ready()
    loss_j(p, jnp.asarray(0), mask).block_until_ready()

    def serial_epoch(p, opt_state):
        for i in range(cfg.n_exp_train):
            g = grad_i(p, jnp.asarray(i), mask)
            updates, opt_state = optimizer.update(g, opt_state, p)
            p = optax.apply_updates(p, updates)
        for i in range(cfg.n_exp):
            loss_j(p, jnp.asarray(i), mask)
        return p, opt_state

    serial_update = jax.jit(
        lambda p, o, i: (lambda g: (lambda u, o2: (optax.apply_updates(p, u), o2))(
            *optimizer.update(g, o, p)))(jax.grad(loss_i)(p, i, mask))
    )
    serial_update(p, opt_state, jnp.asarray(0))[0].block_until_ready()

    n_serial = 3
    t0 = time.perf_counter()
    for _ in range(n_serial):
        pp, oo = p, opt_state
        for i in range(cfg.n_exp_train):
            pp, oo = serial_update(pp, oo, jnp.asarray(i))
        for i in range(cfg.n_exp):
            loss_j(pp, jnp.asarray(i), mask)
    jax.block_until_ready(pp)
    serial_s = (time.perf_counter() - t0) / n_serial

    out = {
        "metric": "case2 per-epoch wall-clock (batched stiff solve+grad, 30 exps x 50 steps)",
        "value": round(batched_s * 1e3, 3),
        "unit": "ms",
        "vs_baseline": round(serial_s / batched_s, 2),
        "sequential_ms": round(sequential_s * 1e3, 3),
        "serial_dispatch_ms": round(serial_s * 1e3, 3),
        "vs_serial_seq": round(serial_s / sequential_s, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()

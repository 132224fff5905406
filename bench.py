"""Benchmark: per-epoch wall-clock across the reference's workload regimes.

Headline (``value``): the case2 batched stiff solve+grad epoch — 30
experiments x 50 timesteps, ns=6+T, nr=3, one optimizer update over the 20
training experiments + loss evaluation of all 30 (exactly the reference's
per-epoch work, case2/case2.jl:192-207) — measured on the SHIPPED default
configuration (batch-major Rosenbrock23 + rank-nr Woodbury W-solve).

The reference publishes no timings (SURVEY.md §6) and Julia is not
installed here (BASELINE.md), so ``vs_baseline`` is the measured speedup
of the batched epoch over the reference's *execution pattern* — serial
experiment-by-experiment dispatch of the same jitted solve+grad on the
same chip. ``sequential_ms`` is the update-count-matched faithful mode
(20 per-experiment updates/epoch in one jitted lax.scan, forward-mode
gradients); ``vs_serial_seq`` = serial_dispatch / sequential.

Breadth (VERDICT round-2 item 5) — one number per workload regime:
- ``fwd_ms``: case2 epoch with forward-mode (jacfwd) gradients through
  the early-exit while driver (the ForwardDiff.gradient analogue).
- ``robertson_ms``: robertson f64 stiff epoch (25 exps x 40 log steps,
  Rosenbrock23, per-species atol — the stiffness stress test).
- ``case3_ms``: case3 explicit epoch (100 exps x 100 steps, Tsit5 — the
  throughput case).
- ``svgd_iter_ms``: one 100-particle SVGD iteration (vmapped particle
  solves + RBF kernel update — the UQ regime; UQ network.jl:227 runs the
  100 solves serially).
- ``eval_fused_ms`` / ``eval_xla_ms``: the no-grad 30-experiment eval
  re-solve via the whole-solve Pallas kernel vs the XLA batch-major
  driver (ops/rb23_solve_kernel.py).

Prints ONE JSON line with all fields.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp


def _time_epoch(setup, n_iters=30, warmup=1):
    trainer = setup.trainer
    state = trainer.init(setup.init_params)
    step = trainer.epoch_fn()
    for _ in range(warmup):
        state, m = step(state)
    m.loss_train.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, m = step(state)
    m.loss_train.block_until_ready()
    return (time.perf_counter() - t0) / n_iters * 1e3


def main() -> None:
    from crnn_tpu.cases.case2 import Case2Config, build

    out = {}

    # --- headline: shipped default case2 epoch ----------------------------
    setup = build(Case2Config())
    batched_ms = _time_epoch(setup, n_iters=30)

    # --- forward-mode variant --------------------------------------------
    s_fwd = build(Case2Config(grad_mode="fwd", batch_major=False))
    s_fwd.trainer.grad_mode = "fwd"
    out["fwd_ms"] = round(_time_epoch(s_fwd, n_iters=30), 3)

    # --- sequential (reference-faithful; fwd-mode default) ----------------
    s_seq = build(Case2Config(mode="sequential"))
    out["sequential_ms"] = round(_time_epoch(s_seq, n_iters=10), 3)

    # --- serial per-experiment dispatch (the reference's loop shape) ------
    import optax

    cfg = Case2Config()
    ds = setup.dataset
    trainer = setup.trainer
    loss_i = trainer.loss_i_exp
    loss_j = jax.jit(loss_i)
    mask = jnp.ones((cfg.datasize,), ds.ys.dtype)
    optimizer = trainer.optimizer
    p = setup.init_params
    opt_state = optimizer.init(p)

    serial_update = jax.jit(
        lambda p, o, i: (lambda g: (lambda u, o2: (optax.apply_updates(p, u), o2))(
            *optimizer.update(g, o, p)))(jax.grad(loss_i)(p, i, mask))
    )
    serial_update(p, opt_state, jnp.asarray(0))[0].block_until_ready()
    loss_j(p, jnp.asarray(0), mask).block_until_ready()

    n_serial = 3
    t0 = time.perf_counter()
    for _ in range(n_serial):
        pp, oo = p, opt_state
        for i in range(cfg.n_exp_train):
            pp, oo = serial_update(pp, oo, jnp.asarray(i))
        for i in range(cfg.n_exp):
            loss_j(pp, jnp.asarray(i), mask)
    jax.block_until_ready(pp)
    serial_ms = (time.perf_counter() - t0) / n_serial * 1e3

    # --- eval-pass: whole-solve Pallas kernel vs XLA driver ---------------
    try:
        from crnn_tpu.ops.crnn_kernels import (
            make_arrhenius_factor_op, make_arrhenius_ops,
        )
        from crnn_tpu.ode.batch_solve import batch_odesolve_rb23
        from crnn_tpu.ops.rb23_solve_kernel import make_arrhenius_fused_solve
        from crnn_tpu.transforms.p2vec import p2vec_case2

        w = p2vec_case2(setup.init_params, cfg.ns, cfg.nr)
        t1 = float(cfg.datasize * cfg.tstep)
        saveat = jnp.linspace(0.0, t1, cfg.datasize)
        rhs_op, _ = make_arrhenius_ops(cfg.lb, cfg.ub, force="xla")
        factor_op = make_arrhenius_factor_op(cfg.lb, cfg.ub)

        @jax.jit
        def xla_solve(u0, w):
            sol = batch_odesolve_rb23(
                lambda t, y, w_: rhs_op(y, w_.w_in, w_.w_b, w_.w_out),
                lambda t, y, w_: factor_op(y, w_.w_in, w_.w_b, w_.w_out),
                u0, 0.0, t1, saveat, args=w, rtol=cfg.rtol, atol=cfg.atol,
                max_steps=cfg.max_steps, unroll="while", jac_mode="lowrank")
            return sol.ys

        fused = jax.jit(make_arrhenius_fused_solve(
            cfg.ns, cfg.nr, cfg.lb, cfg.ub, 0.0, t1, saveat, cfg.rtol,
            cfg.atol, cfg.max_steps))

        for name, fn in (("eval_xla_ms", lambda u: xla_solve(u, w)),
                         ("eval_fused_ms", lambda u: fused(u, w)[0])):
            r = fn(ds.u0)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(50):
                r = fn(ds.u0)
            jax.block_until_ready(r)
            out[name] = round((time.perf_counter() - t0) / 50 * 1e3, 3)
    except Exception as e:  # Pallas path is TPU-toolchain-sensitive
        out["eval_fused_error"] = f"{type(e).__name__}"

    # --- robertson f64 stiff epoch ----------------------------------------
    from crnn_tpu.cases.robertson import RobertsonConfig
    from crnn_tpu.cases.robertson import build as build_rob

    out["robertson_ms"] = round(
        _time_epoch(build_rob(RobertsonConfig()), n_iters=10), 3)

    # --- case3 explicit throughput epoch ----------------------------------
    from crnn_tpu.cases.case3 import Case3Config
    from crnn_tpu.cases.case3 import build as build_c3

    out["case3_ms"] = round(
        _time_epoch(build_c3(Case3Config()), n_iters=10), 3)

    # --- one 100-particle SVGD iteration ----------------------------------
    from crnn_tpu.cases.cathode_uq import CathodeUQConfig, build_uq

    particles, svgd_step, _ = build_uq(CathodeUQConfig())
    i0 = jnp.asarray(0)
    new_p, _ = svgd_step(particles, i0, 2e-4)
    new_p.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(10):
        new_p, _ = svgd_step(new_p, i0, 2e-4)
    new_p.block_until_ready()
    out["svgd_iter_ms"] = round((time.perf_counter() - t0) / 10 * 1e3, 3)

    out.update({
        "metric": "case2 per-epoch wall-clock (batched stiff solve+grad, "
                  "30 exps x 50 steps)",
        "value": round(batched_ms, 3),
        "unit": "ms",
        "vs_baseline": round(serial_ms / batched_ms, 2),
        "serial_dispatch_ms": round(serial_ms, 3),
        "vs_serial_seq": round(serial_ms / out["sequential_ms"], 2),
    })
    print(json.dumps(out))


if __name__ == "__main__":
    main()

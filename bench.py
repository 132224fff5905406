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

Breadth — one number per workload regime:
- ``case2_fused10_epoch_ms``: the same case2 epoch with 10 epochs fused
  into ONE XLA dispatch (Trainer.epochs_fn(10)); per-epoch ms. Isolates
  the host->device launch latency from on-chip work: the gap between
  this and the headline is what long (10k-25k-epoch) runs save with
  ``--epochs-per-dispatch``.
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
  driver (ops/rb23_solve_kernel.py). Round-3 data: these tie at the
  latency floor within the ~0.2 ms run-to-run tunnel variance.

Crash-hardening (round-4): a 60 s subprocess probe with retries runs
BEFORE any compile so a dead backend fails in minutes, not after a
20-minute hang; every metric is emitted as its own JSON line the moment
it is measured (a mid-run outage still leaves the already-measured
numbers in the output tail); metrics are ordered headline-first; each
non-headline metric is individually exception-tolerant. The final line
remains the ONE combined JSON object the driver parses.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

PROBE_TIMEOUT_S = 110  # cold tunnel init + tiny remote compile can take >60s
PROBE_RETRIES = 3
PROBE_BACKOFF_S = (20, 60)


def _emit(tag: str, payload: dict) -> None:
    """Incremental per-metric JSON line (the final combined line comes last)."""
    print(json.dumps({"bench_partial": tag, **payload}), flush=True)


def _probe_backend() -> str:
    """Fail fast if the accelerator backend cannot run a trivial op.

    Runs in a SUBPROCESS with a hard timeout: a hung backend init cannot
    be interrupted in-process (round-3 outage hung ~20 min before failing).
    Retries with backoff on timeout/UNAVAILABLE. If the accelerator stays
    unreachable, falls back to CPU (recorded in the output — a same-chip
    perf record on the wrong platform beats an empty round artifact; the
    round-3 TPU-tunnel outage yielded rc=1 and NO numbers).
    Returns the platform the benchmark will run on.
    """
    code = (
        "import os, jax, jax.numpy as jnp;"
        "p=os.environ.get('CRNN_TPU_PLATFORM');"  # honor the dev override
        "p and jax.config.update('jax_platforms', p);"
        "x=(jnp.ones((4,4))@jnp.ones((4,4))).block_until_ready();"
        "print('PROBE_OK', jax.devices()[0].platform)"
    )
    last = ""
    for attempt in range(PROBE_RETRIES):
        try:
            r = subprocess.run(
                [sys.executable, "-c", code],
                timeout=PROBE_TIMEOUT_S,
                capture_output=True,
                text=True,
                env=os.environ.copy(),
            )
            if r.returncode == 0 and "PROBE_OK" in r.stdout:
                platform = r.stdout.split()[-1]
                _emit("probe", {"ok": True, "attempt": attempt + 1,
                                "platform": platform})
                return platform
            last = (r.stderr or r.stdout).strip()[-400:]
        except subprocess.TimeoutExpired:
            last = f"probe timed out after {PROBE_TIMEOUT_S}s"
        _emit("probe", {"ok": False, "attempt": attempt + 1, "error": last})
        if attempt + 1 < PROBE_RETRIES:
            time.sleep(PROBE_BACKOFF_S[min(attempt, len(PROBE_BACKOFF_S) - 1)])
    _emit("probe", {"ok": False, "fallback": "cpu", "error": last})
    os.environ["CRNN_TPU_PLATFORM"] = "cpu"  # consumed by infra.runtime
    import jax

    jax.config.update("jax_platforms", "cpu")
    return "cpu (accelerator unreachable)"


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


def _live_manifest_jobs() -> list:
    """Live pids from runs/JOBS.manifest (scripts/manifest_run.sh).

    Round 4's capture overlapped a 25k UQ job; every long job now registers
    here with a hard cutoff, and bench flags (in the artifact itself) any
    job still alive at measurement time so a contended number can never
    masquerade as a clean one.
    """
    jobs = []
    try:
        with open(os.path.join(os.path.dirname(__file__) or ".",
                               "runs", "JOBS.manifest")) as fh:
            for line in fh:
                parts = line.split()
                if len(parts) >= 3 and os.path.exists(f"/proc/{parts[0]}"):
                    jobs.append({"pid": int(parts[0]), "cutoff": int(parts[1]),
                                 "tag": parts[2]})
    except FileNotFoundError:
        pass
    return jobs


def main() -> None:
    contended = _live_manifest_jobs()
    if contended:
        _emit("contention", {"live_jobs": contended,
                             "warning": "chip/host shared with live jobs; "
                                        "timings may be contended"})

    platform = _probe_backend()

    import jax
    import jax.numpy as jnp

    from crnn_tpu.cases.case2 import Case2Config, build
    from crnn_tpu.infra.runtime import x64_scope

    out = {"platform": platform}
    if contended:
        out["contended_jobs"] = [j["tag"] for j in contended]

    # --- headline FIRST: shipped default case2 epoch ----------------------
    # (the partial carries the raw value only; the ONE ratio story — same-run
    # serial_dispatch / batched — is computed in the final combined line)
    setup = build(Case2Config())
    batched_ms = _time_epoch(setup, n_iters=30)
    _emit("headline", {"metric": "case2_batched_epoch",
                       "value": round(batched_ms, 3), "unit": "ms"})

    def _metric(name: str, fn) -> None:
        try:
            t0 = time.perf_counter()
            out[name] = fn()
            _emit(name, {"value": out[name],
                         "measure_s": round(time.perf_counter() - t0, 1)})
        except Exception as e:  # keep benching the remaining regimes
            out[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
            _emit(name, {"error": out[f"{name}_error"]})

    # --- fused-dispatch epoch: k epochs per XLA program -------------------
    # The 3 ms-class headline is dispatch-latency-bound on the tunnelled
    # chip; Trainer.guarded-free epochs_fn(k) scans k epochs inside one
    # program, so long runs (the reference protocols are 10k-25k epochs)
    # pay the launch once per k. Reported per-epoch for direct comparison
    # with the headline; same build, same f32 regime.
    def _fused10():
        trainer = setup.trainer
        st = trainer.init(setup.init_params)
        step10 = trainer.epochs_fn(10)
        st, ms = step10(st)  # compile + warm
        ms.loss_train.block_until_ready()
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            st, ms = step10(st)
        ms.loss_train.block_until_ready()
        return round((time.perf_counter() - t0) / (n * 10) * 1e3, 3)

    _metric("case2_fused10_epoch_ms", _fused10)

    # --- breadth metrics, cheapest-compile-first --------------------------
    from crnn_tpu.cases.case3 import Case3Config
    from crnn_tpu.cases.case3 import build as build_c3

    _metric("case3_ms", lambda: round(
        _time_epoch(build_c3(Case3Config()), n_iters=10), 3))

    # f64 regimes: their builds flip the global x64 flag (their training is
    # genuinely double precision) — scope the flip so every metric after
    # these runs in the same f32 regime as the headline (round-4 leak:
    # BENCH_r04 eval_fused_error + fwd_ms measured under x64).
    #
    # Gate: the axon tunnel's emulated f64 has been observed to degrade
    # mid-round into an INDEFINITE block (round 5, 02:53Z: an f64 linspace
    # that ran at 02:34Z hung forever while f32 stayed healthy). A hung
    # metric would eat the driver's whole capture window, so probe f64 in
    # a killable subprocess first and skip the f64-on-device regimes if it
    # fails; the skip reason ships in the artifact.
    from crnn_tpu.infra.runtime import f64_device_ok

    f64_ok = f64_device_ok(timeout_s=90.0)
    if not f64_ok:
        reason = "f64 device canary failed/hung; f64-on-device metrics skipped"
        out["f64_skipped"] = reason
        _emit("f64_canary", {"ok": False, "reason": reason})
    else:
        _emit("f64_canary", {"ok": True})

    def _robertson():
        from crnn_tpu.cases.robertson import RobertsonConfig
        from crnn_tpu.cases.robertson import build as build_rob

        with x64_scope():
            return round(_time_epoch(build_rob(RobertsonConfig()), n_iters=10), 3)

    if f64_ok:
        _metric("robertson_ms", _robertson)
    else:
        _emit("robertson_ms", {"skipped": "f64 canary failed"})

    def _robertson_f32():
        # TPU working-precision stiff epoch (same 25x40 Rosenbrock23
        # workload, dtype=float32): always measurable on-chip — the f64
        # epoch above is emulated and gated on the canary. The f32/f64
        # quality split is documented in runs/robertson_long/
        # f32_experiment.md + comp32_experiment.md (f32 = basin
        # selection, f64 = depth).
        from crnn_tpu.cases.robertson import RobertsonConfig
        from crnn_tpu.cases.robertson import build as build_rob

        with x64_scope():  # generation is f64 (host-pinned); scope the flip
            s = build_rob(RobertsonConfig(dtype="float32"))
        return round(_time_epoch(s, n_iters=10), 3)

    _metric("robertson_f32_ms", _robertson_f32)

    def _svgd():
        from crnn_tpu.cases.cathode_uq import CathodeUQConfig, build_uq

        with x64_scope():
            particles, svgd_step, _ = build_uq(CathodeUQConfig())
            i0 = jnp.asarray(0)
            new_p, _ = svgd_step(particles, i0, 2e-4)
            new_p.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(10):
                new_p, _ = svgd_step(new_p, i0, 2e-4)
            new_p.block_until_ready()
            return round((time.perf_counter() - t0) / 10 * 1e3, 3)

    if f64_ok:
        _metric("svgd_iter_ms", _svgd)
    else:
        _emit("svgd_iter_ms", {"skipped": "f64 canary failed"})

    def _svgd_f32():
        # TPU-native working precision (f64 on v5e is double-float
        # emulation); posterior consistency vs the f64 chain is recorded in
        # runs/cathode_uq/batch_major_consistency.md — this measures the
        # same batch-major iteration with dtype=float32, no x64 scope needed
        from crnn_tpu.cases.cathode_uq import CathodeUQConfig, build_uq

        particles, svgd_step, _ = build_uq(CathodeUQConfig(dtype="float32"))
        i0 = jnp.asarray(0)
        new_p, _ = svgd_step(particles, i0, 2e-4)
        new_p.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(20):
            new_p, _ = svgd_step(new_p, i0, 2e-4)
        new_p.block_until_ready()
        return round((time.perf_counter() - t0) / 20 * 1e3, 3)

    _metric("svgd_iter_f32_ms", _svgd_f32)

    def _fwd():
        s_fwd = build(Case2Config(grad_mode="fwd", batch_major=False))
        s_fwd.trainer.grad_mode = "fwd"
        return round(_time_epoch(s_fwd, n_iters=30), 3)

    _metric("fwd_ms", _fwd)

    _metric("sequential_ms", lambda: round(
        _time_epoch(build(Case2Config(mode="sequential")), n_iters=10), 3))

    # --- serial per-experiment dispatch (the reference's loop shape) ------
    def _serial():
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
        return round((time.perf_counter() - t0) / n_serial * 1e3, 3)

    _metric("serial_dispatch_ms", _serial)

    # --- eval-pass: whole-solve Pallas kernel vs XLA driver ---------------
    def _eval_pair():
        from crnn_tpu.ode.batch_solve import batch_odesolve_rb23
        from crnn_tpu.ops.crnn_kernels import (
            make_arrhenius_factor_op, make_arrhenius_ops,
        )
        from crnn_tpu.ops.rb23_solve_kernel import make_arrhenius_fused_solve
        from crnn_tpu.transforms.p2vec import p2vec_case2

        cfg = Case2Config()
        ds = setup.dataset
        w = p2vec_case2(setup.init_params, cfg.ns, cfg.nr)
        t1 = float(cfg.datasize * cfg.tstep)
        # dtype pinned to the dataset's (f32): the round-4 artifact died here
        # because a leaked global-x64 flip made this linspace f64 and fed it
        # to the f32 Pallas kernel; the x64_scope fixes the cause, the pin
        # removes the sensitivity
        saveat = jnp.linspace(0.0, t1, cfg.datasize, dtype=ds.ys.dtype)
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

        # N=12 INTERLEAVED A/B rounds (round-3/4 demand): alternating blocks
        # cancel tunnel drift that back-to-back 50-shot blocks cannot; the
        # per-round samples ship in the partial so the spread is auditable.
        variants = (("eval_xla_ms", lambda u: xla_solve(u, w)),
                    ("eval_fused_ms", lambda u: fused(u, w)[0]))
        for _, fn in variants:  # compile + warm both before any timing
            jax.block_until_ready(fn(ds.u0))
        samples = {name: [] for name, _ in variants}
        n_pairs, block = 12, 10
        for _ in range(n_pairs):
            for name, fn in variants:
                t0 = time.perf_counter()
                for _ in range(block):
                    r = fn(ds.u0)
                jax.block_until_ready(r)
                samples[name].append((time.perf_counter() - t0) / block * 1e3)
        pair = {}
        for name in samples:
            xs = sorted(samples[name])
            pair[name] = round(xs[len(xs) // 2], 3)  # median of 12 rounds
            pair[name + "_rounds"] = [round(x, 3) for x in samples[name]]
        return pair

    if platform == "tpu":
        try:
            pair = _eval_pair()
            out["eval_xla_ms"] = pair["eval_xla_ms"]
            out["eval_fused_ms"] = pair["eval_fused_ms"]
            _emit("eval_pair", pair)
        except Exception as e:  # Pallas path is TPU-toolchain-sensitive
            # full message, not just the type — BENCH_r04's bare "ValueError"
            # made the artifact undiagnosable
            out["eval_fused_error"] = f"{type(e).__name__}: {e}"[:300]
            _emit("eval_pair", {"error": out["eval_fused_error"]})
    else:  # Mosaic kernel is TPU-only; don't record a spurious error
        _emit("eval_pair", {"skipped": f"pallas kernel n/a on {platform}"})

    # ONE ratio story: vs_baseline = serial_dispatch / batched, both measured
    # in THIS run on the same chip; only if the serial measurement crashed do
    # we fall back to the round-2 driver capture, and the denominator source
    # is named either way so the artifact cannot misquote itself.
    if out.get("serial_dispatch_ms"):
        serial_ms = out["serial_dispatch_ms"]
        denom_src = "serial_dispatch_ms (same run, same chip)"
    else:
        serial_ms = 417.42
        denom_src = "BENCH_r02 driver-captured serial_dispatch_ms=417.42 (fallback)"
    out.update({
        "metric": "case2 per-epoch wall-clock (batched stiff solve+grad, "
                  "30 exps x 50 steps)",
        "value": round(batched_ms, 3),
        "unit": "ms",
        "vs_baseline": round(serial_ms / batched_ms, 2),
        "vs_baseline_denominator": denom_src,
        "serial_dispatch_ms": serial_ms,
        "vs_serial_seq": (round(serial_ms / out["sequential_ms"], 2)
                          if out.get("sequential_ms") else None),
    })
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

"""Measure single-epoch vs fused-K dispatch on the real TPU.

Evidence for the multi-epoch fusion feature (train/loop.py epochs_fn):
the case2 headline epoch is dispatch-latency-bound on the tunnelled chip
(Pallas-vs-XLA A/B tie, BENCH_r05 partials), so K epochs per program
should approach the pure on-chip epoch cost. Writes one JSON line; run
under scripts/manifest_run.sh with a hard deadline (the tunnel flaps).
"""

import json
import time


def main():
    import jax

    from crnn_tpu.cases.case2 import Case2Config, build

    platform = jax.devices()[0].platform
    setup = build(Case2Config())
    tr = setup.trainer

    def time_single(n=30):
        st = tr.init(setup.init_params)
        step = tr.epoch_fn()
        st, m = step(st)
        m.loss_train.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(n):
            st, m = step(st)
        m.loss_train.block_until_ready()
        return (time.perf_counter() - t0) / n * 1e3

    def time_fused(k, n=5):
        st = tr.init(setup.init_params)
        stepk = tr.epochs_fn(k)
        st, ms = stepk(st)
        ms.loss_train.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(n):
            st, ms = stepk(st)
        ms.loss_train.block_until_ready()
        return (time.perf_counter() - t0) / (n * k) * 1e3

    single = time_single()
    fused10 = time_fused(10)
    fused50 = time_fused(50, n=2)
    print(json.dumps({
        "platform": platform,
        "case2_epoch_ms": round(single, 3),
        "case2_fused10_epoch_ms": round(fused10, 3),
        "case2_fused50_epoch_ms": round(fused50, 3),
        "fusion_speedup_k10": round(single / fused10, 2),
        "fusion_speedup_k50": round(single / fused50, 2),
    }), flush=True)


if __name__ == "__main__":
    main()

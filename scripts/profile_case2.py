"""Capture a jax.profiler trace of the case2 training epoch and extract
device-utilization evidence (VERDICT.md round-2 item 1: no utilization
numbers existed for the quoted epoch time).

Writes runs/profile/: the raw .xplane.pb trace plus op_profile /
framework_op_stats JSON extracted via xprof, and prints a summary
(device-time fraction, top device ops) for BASELINE.md.

Run on the TPU: python scripts/profile_case2.py [n_epochs]
Requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python for xprof's
pure-python proto parsing (set automatically below).
"""

import glob
import json
import os
import sys

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_epochs=50, out_dir="runs/profile"):
    import time

    import jax

    from crnn_tpu.cases.case2 import Case2Config, build

    print("building case2...", flush=True)
    setup = build(Case2Config())
    trainer = setup.trainer
    state = trainer.init(setup.init_params)
    step = trainer.epoch_fn()
    print("compiling epoch...", flush=True)
    state, m = step(state)
    m.loss_train.block_until_ready()
    print("compiled; tracing...", flush=True)

    os.makedirs(out_dir, exist_ok=True)
    trace_dir = os.path.join(out_dir, "trace")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for _ in range(n_epochs):
            state, m = step(state)
        m.loss_train.block_until_ready()
    wall = time.perf_counter() - t0
    print(f"{n_epochs} epochs traced in {wall:.3f}s "
          f"({wall / n_epochs * 1e3:.2f} ms/epoch)", flush=True)

    xplanes = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                        recursive=True)
    if not xplanes:
        print("no xplane.pb found under", trace_dir)
        return
    print("xplane:", xplanes[0], flush=True)

    from xprof.convert import raw_to_tool_data

    for tool in ("framework_op_stats", "op_profile", "overview_page"):
        try:
            data, _ = raw_to_tool_data.xspace_to_tool_data(
                [xplanes[0]], tool, {})
            path = os.path.join(out_dir, f"{tool}.json")
            if isinstance(data, bytes):
                data = data.decode("utf-8", errors="replace")
            with open(path, "w") as f:
                f.write(data if isinstance(data, str) else json.dumps(data))
            print(f"wrote {path} ({os.path.getsize(path)} bytes)", flush=True)
        except Exception as e:  # tool coverage varies by xprof version
            print(f"{tool} failed: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    main(n)

"""Short TPU training runs of every case family; artifacts under runs/.

Produces loss curves, prediction figures and checkpoints for the full case
matrix — the per-case demo equivalent of running each reference script.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time
import traceback


def run(name, build_fn, cfg, epochs, n_plot=None):
    from crnn_tpu.cases.base import run_case

    t0 = time.time()
    try:
        setup = build_fn(cfg)
        run_case(setup, n_epoch=epochs, out_dir="runs",
                 n_plot=n_plot or max(epochs // 4, 1), log_every=0)
        print(f"== {name}: OK in {time.time()-t0:.0f}s", flush=True)
    except Exception:
        print(f"== {name}: FAILED", flush=True)
        traceback.print_exc()


def main():
    from crnn_tpu.cases import case1, case1_rev, case2, case3, hychem, robertson, robertson_qssa, yeast

    run("case1", case1.build, case1.Case1Config(lr=5e-3, grad_max=2.0), 2000)
    run("case1_hard", case1.build,
        case1.Case1Config(lr=5e-3, grad_max=2.0, p_cutoff=0.01), 200)
    run("case1_rev", case1_rev.build, case1_rev.Case1RevConfig(lr=5e-3), 2000)
    run("case2", case2.build, case2.Case2Config(solver="rosenbrock23"), 2000)
    run("case2_missing", case2.build,
        case2.Case2Config(solver="rosenbrock23", i_obs=(0, 1, 3, 4, 5),
                          missing_u0=True), 1000)
    run("case3", case3.build, case3.Case3Config(), 1000)
    run("grn", case3.build, case3.grn_config(), 1000)
    run("robertson", robertson.build, robertson.RobertsonConfig(), 500)
    run("robertson_qssa", robertson_qssa.build, robertson_qssa.QSSAConfig(), 300)
    run("yeast", yeast.build, yeast.YeastConfig(), 300)
    run("hychem", hychem.build, hychem.HyChemConfig(), 1000)

    # cathode + UQ have their own drivers; UQ warm-starts from the trained
    # cathode optimum (the reference's deterministic checkpoint)
    from crnn_tpu.cases.cathode import CathodeConfig, run_cathode

    p_opt = None
    try:
        _, best = run_cathode(CathodeConfig(n_epoch=300, mode="batch"),
                              out_dir="runs")
        p_opt = best["params"]
        print("== cathode: OK", flush=True)
    except Exception:
        print("== cathode: FAILED", flush=True)
        traceback.print_exc()

    from crnn_tpu.cases.cathode_uq import CathodeUQConfig, run_uq

    try:
        run_uq(CathodeUQConfig(n_iters=50, num_particles=50, n_replicates=50),
               p_opt=p_opt, verbose=True)
        print("== cathode_uq: OK", flush=True)
    except Exception:
        print("== cathode_uq: FAILED", flush=True)
        traceback.print_exc()


if __name__ == "__main__":
    main()

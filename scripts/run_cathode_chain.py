"""Cathode deterministic fit -> SVGD UQ warm-started from its optimum."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from crnn_tpu.cases.cathode import CathodeConfig, run_cathode

_, best = run_cathode(CathodeConfig(n_epoch=500, mode="batch"), out_dir="runs")
print("== cathode OK; best train", best["loss_train"], flush=True)

from crnn_tpu.cases.cathode_uq import CathodeUQConfig, run_uq
from crnn_tpu.uq.posterior import (
    animate_particle_evolution,
    plot_correlation_heatmap,
    plot_particle_histograms,
    posterior_moments,
)

cfg = CathodeUQConfig(n_iters=120, num_particles=64, n_replicates=64)
particles, info = run_uq(cfg, p_opt=best["params"], verbose=True)
print("== cathode_uq OK; final train loss", info["loss_train"][-1], flush=True)

out = "runs/cathode_uq"
names = ([f"lnA{i}" for i in range(1, 4)] + [f"Ea{i}" for i in range(1, 4)]
         + [f"b{i}" for i in range(1, 4)] + [f"dH{i}" for i in range(1, 4)]
         + [f"n{i}" for i in range(1, 4)] + ["nu2", "nu3"])
parts = np.asarray(particles)
plot_correlation_heatmap(parts, os.path.join(out, "corr.png"), names)
plot_particle_histograms(parts, os.path.join(out, "hist.png"), names)
if info["history"].size:
    animate_particle_evolution(info["history"], os.path.join(out, "evolution.gif"),
                               param_pair=(0, 3))
m = posterior_moments(parts)
np.save(os.path.join(out, "particles.npy"), parts)
print("posterior std:", np.round(m["std"], 4), flush=True)
print("DONE", flush=True)

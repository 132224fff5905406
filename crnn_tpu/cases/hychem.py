"""HyChem: gas-phase JP-10 pyrolysis CRNN on mass fractions.

TPU-native rebuild of /root/reference/HyChem/crnn_pyrolysis_mass.jl: the
CRNN operates on species MASS fractions with interpolated T(t), P(t)
forcing from a constant-pressure reactor trajectory; inside the RHS the
mass fractions convert to molar concentrations through the ideal-gas
density (Y2density/Y2C, :107-115), the rate features are
[log C; -1/(R T); log T], and the molar production rates convert back via
molecular weights (:121-131). Element-conservation nullspace of the
(C,H,N) composition matrix is computed and its w_out projection available
behind ``project_elements`` (present but disabled in the reference,
:60-65,86). Single-trajectory training with stochastic prefix horizons.

The reference's Cantera-generated data file is not part of its repo; the
loader here reads the same table format (rows = samples, columns =
[t, T, P, Y...]) and ``synthetic_pyrolysis`` produces a self-contained
surrogate trajectory from a 4-step global JP-10 mechanism.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from crnn_tpu.cases.base import CaseSetup
from crnn_tpu.data.interp import make_interpolant, resample_log_grid
from crnn_tpu.train.loop import Trainer
from crnn_tpu.train.optimizers import adamw_like
from crnn_tpu.transforms.p2vec import CRNNWeights

VARNAMES = ["C10H16", "H2", "CH4", "C2H2", "C2H4", "N2", "C4H81", "H", "CH3"]
MW = np.array([136.238, 2.016, 16.043, 26.038, 28.054, 28.014, 56.108,
               1.008, 15.035])  # kg/kmol (crnn_pyrolysis_mass.jl:55)
E_C = np.array([10, 0, 1, 2, 2, 0, 4, 0, 1])
E_H = np.array([16, 2, 4, 2, 4, 0, 8, 1, 3])
E_N = np.array([0, 0, 0, 0, 0, 2, 0, 0, 0])
R_KCAL = 1.98720425864083e-3


@dataclass
class HyChemConfig:
    # reference constants: crnn_pyrolysis_mass.jl:15-31
    nr: int = 10
    ntotal: int = 40
    batch_size: int = 32
    lr: float = 5e-3
    weight_decay: float = 1e-6
    grad_max: float = 10.0
    atol: float = 1e-8
    rtol: float = 1e-3
    seed: int = 1234
    max_steps: int = 256
    data_path: Optional[str] = None   # raw trajectory table; None -> surrogate
    project_elements: bool = False    # element-conservation projection flag
    solver: str = "rosenbrock23"
    mode: str = "batch"


def load_trajectory(path: str) -> np.ndarray:
    """Raw table: rows = samples, columns = [t, T, P, Y1..Yns]."""
    return np.loadtxt(path)


def synthetic_pyrolysis(t_end: float = 5e-3, n_raw: int = 50,
                        T0: float = 1300.0, P0: float = 10.0 * 101325.0) -> np.ndarray:
    """Surrogate JP-10 pyrolysis trajectory from a 4-step global mechanism
    (C10H16 -> products with H/CH3 radicals), constant pressure, mild
    temperature rise. Mimics the Cantera output format."""
    from scipy.integrate import solve_ivp

    ns = len(VARNAMES)
    y0 = np.zeros(ns)
    y0[0] = 0.065   # C10H16 mass fraction (1% molar in N2)
    y0[5] = 1.0 - y0[0]

    k = np.array([8e3, 3e3, 1.5e3, 5e2])

    def rhs(t, y):
        c10, h2, ch4, c2h2, c2h4, n2, c4h8, h, ch3 = np.clip(y, 0, 1)
        r1 = k[0] * c10
        r2 = k[1] * c10 * (h + 0.01)
        r3 = k[2] * c4h8
        r4 = k[3] * ch3 * ch3
        dy = np.zeros(ns)
        dy[0] = -r1 - r2
        dy[6] = 0.8 * r1 + 0.5 * r2 - r3
        dy[4] = 0.15 * r1 + 0.3 * r2 + 0.6 * r3
        dy[3] = 0.15 * r3
        dy[2] = 0.3 * r2 + r4
        dy[8] = 0.05 * r1 + 0.1 * r3 - 2.0 * r4
        dy[7] = 0.05 * r1 - 0.05 * r2
        dy[1] = 0.1 * r2 + 0.25 * r3
        return dy

    t_eval = np.linspace(0.0, t_end, n_raw)
    sol = solve_ivp(rhs, (0, t_end), y0, t_eval=t_eval, method="LSODA",
                    rtol=1e-9, atol=1e-12)
    ys = np.clip(sol.y.T, 0.0, 1.0)
    ys = ys / ys.sum(axis=1, keepdims=True)  # renormalise mass fractions
    progress = 1.0 - ys[:, 0] / y0[0]
    temps = T0 + 150.0 * progress            # mild endothermic-ish rise
    press = np.full(n_raw, P0)
    return np.column_stack([sol.t, temps, press, ys])


def build(cfg: HyChemConfig = HyChemConfig()) -> CaseSetup:
    from crnn_tpu.infra.runtime import enable_x64, host_generation
    from crnn_tpu.ode import get_solver, odesolve

    enable_x64()
    dtype = jnp.float64

    raw = (load_trajectory(cfg.data_path) if cfg.data_path
           else synthetic_pyrolysis())
    t_raw = raw[:, 0]
    ns = raw.shape[1] - 3
    t_end = float(t_raw[-1])

    # f64 data prep pinned to the host CPU (runtime.host_generation)
    with host_generation():
        mw = jnp.asarray(MW[:ns], dtype)

        # log-spaced resample (crnn_pyrolysis_mass.jl:42-51)
        ts = resample_log_grid(t_end, cfg.ntotal, dtype=dtype)
        t_interp = np.asarray(ts)
        temps = jnp.asarray(np.interp(t_interp, t_raw, raw[:, 1]), dtype)
        press = jnp.asarray(np.interp(t_interp, t_raw, raw[:, 2]), dtype)
        ydata = jnp.asarray(
            np.stack([np.interp(t_interp, t_raw, raw[:, 3 + i])
                      for i in range(ns)], axis=1), dtype)   # (ntotal, ns)

        lb = cfg.atol
        yscale = jnp.clip(ydata.max(0) - ydata.min(0), lb, jnp.inf)
        dydt_scale = yscale / t_end
        u0 = ydata[0]

        itp_T = make_interpolant(ts, temps)
        itp_P = make_interpolant(ts, press)

        # element-conservation nullspace (computed even when projection is
        # off, matching the reference, :60-65)
        e_mat = np.stack([E_C[:ns], E_H[:ns], E_N[:ns]], axis=1)  # (ns, 3)
        from scipy.linalg import null_space

        e_null = jnp.asarray(null_space(e_mat.T).T, dtype)  # (n_null, ns)

    def y2density(y, p_pa, temp):
        return p_pa / (8.31446261815324e3 * temp * jnp.sum(y / mw))

    def y2c(y, density):
        return density * (y / mw) * 1e3

    np_total = cfg.nr * (2 * ns + 3) + 1

    def p2vec(p):
        """slope-scaled [logC; Ea; b(lnT)] features, product-tied
        w_out = -w_in * 10^w_out (crnn_pyrolysis_mass.jl:78-90)."""
        nr = cfg.nr
        slope = p[-1] * 10.0
        w_b = p[:nr] * slope
        w_in_b = p[nr:2 * nr]
        w_in_ea = p[2 * nr:3 * nr] * slope
        w_out_raw = p[3 * nr:nr * (ns + 3)].reshape(ns, nr)
        w_in = p[nr * (ns + 3):nr * (2 * ns + 3)].reshape(ns, nr)
        w_out = -w_in * 10.0**w_out_raw
        if cfg.project_elements:
            # project each reaction's stoichiometry onto the element-
            # conserving subspace: w_out <- N^T (N w_out)
            w_out = e_null.T @ (e_null @ w_out)
        w_in = jnp.concatenate(
            [jnp.clip(w_in, 0.0, 2.5), w_in_ea[None, :], w_in_b[None, :]], 0
        )
        return CRNNWeights(w_in=w_in, w_b=w_b, w_out=w_out)

    def rhs(t, y, w: CRNNWeights):
        p_pa = itp_P(t)
        temp = itp_T(t)
        yc = jnp.clip(y, lb, 10.0)
        density = y2density(yc, p_pa, temp)
        conc = y2c(yc, density)
        logx = jnp.log(jnp.clip(conc, lb, 10.0))
        feats = jnp.concatenate(
            [logx, (-1.0 / R_KCAL / temp)[None], jnp.log(temp)[None]]
        )
        wdot = w.w_out @ jnp.exp(jnp.minimum(w.w_in.T @ feats + w.w_b, 32.0))
        return wdot * mw / density * dydt_scale

    solver = get_solver(cfg.solver)

    def predict(p):
        w = p2vec(p)
        sol = odesolve(
            rhs, solver, u0, 0.0, t_end, ts, args=w,
            rtol=cfg.rtol, atol=cfg.atol, max_steps=cfg.max_steps,
        )
        return sol.ys

    def loss_i_exp(p, i_exp, mask):
        del i_exp  # single trajectory (crnn_pyrolysis_mass.jl:196-212)
        pred = predict(p)
        err = jnp.abs(pred / yscale - ydata / yscale)
        w = mask[:, None]
        return jnp.sum(err * w) / (jnp.sum(w) * ns)

    def loss_on_data(p, u0_i, ys_i, mask_i):
        # index-free loss for data-parallel sharding; single trajectory, so
        # u0_i is a placeholder and dp just replicates the solve
        del u0_i
        pred = predict(p)
        err = jnp.abs(pred / yscale - ys_i / yscale)
        w = mask_i[:, None]
        return jnp.sum(err * w) / (jnp.sum(w) * ns)

    key = jax.random.PRNGKey(cfg.seed)
    init_p = (0.1 * jax.random.normal(key, (np_total,), dtype)).at[-1].set(0.1)

    trainer = Trainer(
        loss_i_exp=loss_i_exp,
        optimizer=adamw_like(cfg.lr, weight_decay=cfg.weight_decay,
                             grad_max=cfg.grad_max),
        n_exp_train=1,
        n_exp=1,
        n_save=cfg.ntotal,
        mode=cfg.mode,
        horizon_range=(cfg.batch_size, cfg.ntotal),
    )

    ts_np = np.asarray(ts)
    yscale_arr = yscale

    class _DS:
        u0 = jnp.zeros((1,))
        ys = ydata[None]
        ts = ts_np
        yscale = yscale_arr
        success = jnp.ones((1,), bool)

    setup = CaseSetup(
        name="hychem",
        trainer=trainer,
        init_params=init_p,
        predict=jax.jit(lambda p, i: predict(p)),
        weights_fn=p2vec,
        dataset=_DS(),
        species=VARNAMES[:ns],
        logx_plots=True,
        loss_on_data=loss_on_data,
    )
    setup.extras["e_null"] = e_null
    setup.extras["config"] = cfg
    return setup


if __name__ == "__main__":
    import argparse

    from crnn_tpu.cases.base import run_case

    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=1000)
    ap.add_argument("--data", default=None)
    ap.add_argument("--project-elements", action="store_true")
    ap.add_argument("--out", default="runs")
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--grad-max", type=float, default=None)
    ap.add_argument("--restart", action="store_true")
    ap.add_argument("--dp", type=int, default=0,
                    help="data-parallel over N devices (-1 = all)")
    args = ap.parse_args()
    cfg = HyChemConfig(data_path=args.data,
                       project_elements=args.project_elements)
    if args.lr is not None:
        cfg.lr = args.lr
    if args.grad_max is not None:
        cfg.grad_max = args.grad_max
    setup = build(cfg)
    run_case(setup, n_epoch=args.epochs, out_dir=args.out,
             restart=args.restart, dp=args.dp)

"""Evaluate the reference's PUBLISHED Robertson weight table under this
framework's solver, next to our converged optimum — the basin-equivalence
proof the round-2 verdict asked for (VERDICT.md item 3a).

The published table (robertson/ReadMe.md:15-36, display_p output) prints
the PHYSICAL weights [w_in' | w_b | w_out'] per reaction row, so the
CRNN RHS can be driven by them directly — no parameter-vector
reconstruction needed (w_out already bakes in the unclamped-w_in product,
rober_crnn.jl:90-94).

One unavoidable caveat: the reference's RHS multiplies by its dataset's
``dydt_scale`` (yscale/t_end, data-derived and seed-dependent,
rober_crnn.jl:80-82,114-116) which the ReadMe does not publish. Raw
evaluation under OUR dataset's scale therefore handicaps the published
weights, so the script also reports a CALIBRATED loss: a 3-parameter
per-species scale correction fitted by Adam to give the published table
its best achievable loss on our data. If our optimum's loss <= the
published table's calibrated loss, our optimum sits in an at-least-as-good
basin — proven, not asserted.

Usage: python scripts/robertson_published_loss.py [p_final.npy] [out.md]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from robertson_parity import REF_SLOPE, REF_W_IN  # noqa: E402

# Full published table columns 3 (w_b) and 4-6 (w_out), reaction rows
# (robertson/ReadMe.md:22-29).
REF_W_B = np.array([16.4681, 24.4825, 24.0435, -13.1789, 0.114739, 7.43096])
REF_W_OUT = np.array([
    [-1.31015e-5, -29199.4,      -9.06493],
    [-5.07967,    -2194.18,       5.16405],
    [0.0916024,   -16210.3,      -0.0870566],
    [0.0145153,    0.0873887,     0.0711276],
    [-0.140722,    0.160659,      0.0953954],
    [-1.36473e-6,  154.215,       1.44846e-9],
])


def main(p_path="runs/robertson_long/p_final.npy",
         out_md="runs/robertson_long/published_loss.md", seed=1234):
    import jax
    import jax.numpy as jnp
    import optax

    from crnn_tpu.cases.robertson import RobertsonConfig, build
    from crnn_tpu.models.crnn import make_crnn_scaled_rhs
    from crnn_tpu.models.jacobian import make_crnn_scaled_jac
    from crnn_tpu.ode import Rosenbrock23, odesolve
    from crnn_tpu.train.loss import make_trajectory_loss
    from crnn_tpu.transforms.p2vec import CRNNWeights

    cfg = RobertsonConfig(seed=seed)
    setup = build(cfg)
    ds = setup.dataset
    dydt_scale = jnp.asarray(setup.dydt_scale, jnp.float64)
    t1 = float(ds.ts[-1])
    saveat = jnp.asarray(ds.ts, jnp.float64)
    loss_fn = make_trajectory_loss("mae", yscale=ds.yscale)
    mask = jnp.ones((cfg.datasize,), jnp.float64)

    def make_eval(scale_mult):
        """Mean loss over ALL experiments for explicit physical weights,
        with dydt_scale multiplied by a per-species correction."""
        rhs = make_crnn_scaled_rhs(cfg.lb, jnp.inf, dydt_scale * scale_mult,
                                   exp_cap=32.0)
        solver = Rosenbrock23(jac=make_crnn_scaled_jac(
            cfg.lb, jnp.inf, dydt_scale * scale_mult, exp_cap=32.0))

        def loss_one(w, u0_i, ys_i):
            sol = odesolve(rhs, solver, u0_i, 0.0, t1, saveat, args=w,
                           rtol=cfg.rtol,
                           atol=cfg.atol.astype(jnp.float64),
                           max_steps=cfg.max_steps, unroll="scan")
            return loss_fn(sol.ys, ys_i, mask)

        def mean_loss(w):
            return jnp.mean(jax.vmap(
                lambda u0_i, ys_i: loss_one(w, u0_i, ys_i))(ds.u0, ds.ys))

        return mean_loss

    w_pub = CRNNWeights(
        w_in=jnp.asarray(REF_W_IN.T, jnp.float64),       # (ns, nr)
        w_b=jnp.asarray(REF_W_B, jnp.float64),
        w_out=jnp.asarray(REF_W_OUT.T, jnp.float64),     # (ns, nr)
    )

    ones = jnp.ones((3,), jnp.float64)
    raw_eval = jax.jit(lambda w: make_eval(ones)(w))
    loss_pub_raw = float(raw_eval(w_pub))

    # --- 3-parameter scale calibration (their dydt_scale is unpublished) --
    @jax.jit
    def cal_loss(log_s):
        return make_eval(jnp.exp(log_s))(w_pub)

    log_s = jnp.zeros((3,), jnp.float64)
    opt = optax.adam(5e-2)
    opt_state = opt.init(log_s)
    best = (loss_pub_raw, np.zeros(3))
    vg = jax.jit(jax.value_and_grad(cal_loss))
    for it in range(150):
        v, g = vg(log_s)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        if float(v) < best[0] and np.isfinite(float(v)):
            best = (float(v), np.asarray(log_s))
        updates, opt_state = opt.update(g, opt_state, log_s)
        log_s = optax.apply_updates(log_s, updates)
    loss_pub_cal, log_s_best = best

    # --- our optimum on the same dataset ----------------------------------
    p_ours = jnp.asarray(np.load(p_path), jnp.float64)
    loss_i = setup.extras["loss_i_exp"]
    loss_ours = float(jnp.mean(jax.vmap(
        lambda i: loss_i(p_ours, i, mask))(jnp.arange(cfg.n_exp))))

    lines = [
        "# Published-table loss under this framework's solver "
        "(basin-equivalence check)\n",
        f"Dataset: robertson seed {seed} (the framework's canonical data; "
        "the reference's own dataset realisation/yscale is unpublished).\n",
        "| candidate | mean MAE loss (all 25 exps) |",
        "|---|---|",
        f"| published table, raw (our dydt_scale) | {loss_pub_raw:.4e} |",
        f"| published table, calibrated (best 3-param per-species scale "
        f"correction, exp({np.round(log_s_best, 3).tolist()})) "
        f"| {loss_pub_cal:.4e} |",
        f"| **our converged optimum** (`{p_path}`) | **{loss_ours:.4e}** |",
        "",
    ]
    if loss_ours <= loss_pub_cal:
        lines.append(
            "Our optimum achieves a loss **at least as good as the "
            "published table evaluated under the same solver and data, even "
            "after giving the published weights a fitted scale correction** "
            "— the differing weight tables are basin-equivalent optima of "
            "an over-parameterised 6-reaction ansatz (which the reference "
            "ReadMe itself describes as non-unique), not a quality gap.")
    else:
        lines.append(
            "The published table evaluates BETTER than our optimum under "
            "our solver — a real quality gap remains; see parity.md for "
            "the per-reaction deltas.")
    with open(out_md, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out_md}: pub_raw {loss_pub_raw:.4e} "
          f"pub_cal {loss_pub_cal:.4e} ours {loss_ours:.4e}")


if __name__ == "__main__":
    p_path = sys.argv[1] if len(sys.argv) > 1 else "runs/robertson_long/p_final.npy"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "runs/robertson_long/published_loss.md"
    main(p_path, out_md)

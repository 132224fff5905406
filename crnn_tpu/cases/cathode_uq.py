"""Cathode NCM UQ: Bayesian CRNN posterior via SVGD particles.

TPU-native rebuild of /root/reference/Cathode_NCM333_UQ/src_333/: a
100-particle SVGD ensemble over the 17 Cathode kinetic parameters,
warm-started from the deterministic optimum with physics-informed
correlated lnA-Ea init (network.jl:26-46), per-experiment noise-normalised
score gradients (dlnprob, network.jl:222-260), and replicate-curve MSE
likelihood (network.jl:262-275).

TPU-first redesign: the reference evaluates the 100 particle gradients
SERIALLY per experiment (network.jl:227); here one ``vmap`` over particles
(optionally sharded over the device mesh) evaluates every particle's
solve+gradient in a single XLA program per iteration.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from crnn_tpu.data.loaders import synthetic_dsc
from crnn_tpu.models.crnn import cathode_hrr, make_cathode_rhs
from crnn_tpu.ode import get_solver, odesolve
from crnn_tpu.transforms.p2vec import init_params_cathode, p2vec_cathode
from crnn_tpu.uq.posterior import ParticleHistory
from crnn_tpu.uq.svgd import rbf_kernel


@dataclass
class CathodeUQConfig:
    # mirrors Cathode_NCM333_UQ/config.yaml:27-33
    num_particles: int = 100
    stepsize: float = 2e-4
    stepsize_decay: float = 0.95
    stepsize_decay_epochs: int = 500
    gap: int = 10
    n_iters: int = 500
    n_replicates: int = 100
    noise_level: float = 0.05
    init_jitter: float = 1e-3
    lb: float = 1e-8
    maxiters: int = 512
    rtol: float = 1e-4
    # rosenbrock23 default (round 5): the TRBDF2-vs-Rosenbrock23 posterior
    # consistency check is in runs/cathode_uq/posterior_summary.md (round 2)
    # and the batch-major-vs-per-lane check in runs/cathode_uq/batch_major_
    # consistency.md; TRBDF2 stays available via --solver trbdf2.
    solver: str = "rosenbrock23"
    # batch-major likelihood (round 5): ALL particles integrate as one
    # fused batch per solver step (ode/batch_solve.py nonautonomous mode,
    # analytic bidiagonal Jacobian + df/dt) instead of vmap over per-lane
    # drivers — the TPU-shaped replacement for the reference's serial
    # particle loop (UQ network.jl:227). Only takes effect with
    # solver == "rosenbrock23" (the batch driver IS a Rosenbrock23).
    batch_major: bool = True
    # working precision. float64 matches the reference (Julia f64 on CPU);
    # TPU emulates f64 as double-float pairs at ~10x the f32 multiply cost,
    # so float32 is the TPU-native regime — the likelihood tolerances
    # (rtol 1e-4 against 5%-noise replicate curves) sit far above f32
    # round-off; posterior consistency vs f64 is recorded in
    # runs/cathode_uq/batch_major_consistency.md before any default flips.
    dtype: str = "float64"
    val_index: int = 3
    seed: int = 0
    data_dir: Optional[str] = None
    # data-parallel particle sharding over a dp-device mesh (-1 = all
    # devices); num_particles must divide the mesh. The particle axis is
    # the embarrassingly parallel dimension (each particle = one
    # solve+gradient); the (n, n) RBF kernel update stays replicated
    # (parallel/svgd_dp.py).
    dp: int = 0


def correlated_init(key, p_opt: np.ndarray, cfg: CathodeUQConfig) -> jnp.ndarray:
    """Particles in normalised coordinates (1.0 == deterministic optimum)
    with correlated lnA-Ea perturbations per reaction (network.jl:26-46)."""
    n, d = cfg.num_particles, 17
    k_noise, k1, k2, k3 = jax.random.split(key, 4)
    p_scales = p_opt[:17].copy()
    slope = p_opt[17] * 10.0
    p_scales[0:3] *= 20.0 * slope      # lnA scaling
    p_scales[9:12] *= 100.0            # delH scaling
    particles = jnp.ones((n, d)) + cfg.init_jitter * jax.random.normal(k_noise, (n, d))
    # correlated lnA-Ea around the R1/R2/R3 peak temperatures
    for i, (kk, peak_c) in enumerate(zip((k1, k2, k3), (270.0, 310.0, 430.0))):
        rt = 8.314 * (peak_c + 273.15)
        picker = jax.random.normal(kk, (n,))
        ln_a = picker + p_scales[i]
        ea = picker * rt / 1e5 + p_scales[3 + i]
        particles = particles.at[:, i].set(ln_a / p_scales[i])
        particles = particles.at[:, 3 + i].set(ea / p_scales[3 + i])
    return particles, jnp.asarray(p_scales)


def build_uq(cfg: CathodeUQConfig = CathodeUQConfig(),
             p_opt: Optional[np.ndarray] = None):
    """Returns (state dict, step_fn, extras). step_fn advances one SVGD
    iteration over one experiment's likelihood."""
    dtype = jnp.dtype(cfg.dtype)
    if dtype == jnp.float64:
        from crnn_tpu.infra.runtime import enable_x64

        enable_x64()
    from crnn_tpu.infra.runtime import host_generation

    key = jax.random.PRNGKey(cfg.seed)
    k_init, k_rep = jax.random.split(key)

    # --- data: replicate noisy HRR curves per heating rate ----------------
    # (pinned to the host CPU: f64 array creation must not touch the
    # accelerator — runtime.host_generation)
    with host_generation():
        if cfg.data_dir:
            # real measured replicate curves (UQ dataset.jl:5-24 format)
            from crnn_tpu.data.loaders import load_uncert_dir

            unc = load_uncert_dir(cfg.data_dir)
            ts = jnp.asarray(unc.ts, dtype)
            masks = jnp.asarray(unc.mask, dtype)
            betas = jnp.asarray(unc.betas, dtype)
            reps = jnp.asarray(unc.reps, dtype)              # (n_exp, n_t, n_rep)
            mean_curve = np.asarray(unc.reps).mean(axis=2)   # (n_exp, n_t)
        else:
            dsc = synthetic_dsc(seed=cfg.seed, noise=0.0)
            ts = jnp.asarray(dsc.ts, dtype)
            masks = jnp.asarray(dsc.mask, dtype)
            betas = jnp.asarray(dsc.betas, dtype)
            clean = jnp.asarray(dsc.hrr, dtype)              # (n_exp, n_t)
            reps = clean[:, :, None] * (
                1.0
                + cfg.noise_level
                * jax.random.normal(k_rep, clean.shape + (cfg.n_replicates,),
                                    dtype)
            )                                                # (n_exp, n_t, n_rep)
            mean_curve = np.asarray(clean)
    n_exp = ts.shape[0]
    n_rep = reps.shape[2]
    # per-experiment noise normaliser: noise_level x peak HRR per heating
    # rate — reproduces the reference's hardcoded Normalizer table
    # ("based on peak value and noise", UQ dataset.jl:27-32)
    normalizer = jnp.asarray(
        [float(cfg.noise_level * np.max(mean_curve[i])) for i in range(n_exp)],
        dtype,
    )

    # --- deterministic optimum (warm start) --------------------------------
    if p_opt is None:
        p_opt = np.asarray(init_params_cathode(jax.random.PRNGKey(1), dtype))
    particles, p_scales = correlated_init(k_init, np.asarray(p_opt), cfg)
    particles = particles.astype(dtype)
    p_scales = p_scales.astype(dtype)

    rhs = make_cathode_rhs(cfg.lb)
    solver = get_solver(cfg.solver)
    u0 = jnp.zeros((3,), dtype).at[0].set(1.0)

    def denormalise(p_norm):
        """Normalised particle -> raw 18-vector for p2vec (slope appended)."""
        raw17 = p_norm * p_scales / jnp.concatenate([
            jnp.asarray([20.0 * p_opt[17] * 10.0] * 3, dtype),
            jnp.ones(6, dtype),
            jnp.asarray([100.0] * 3, dtype),
            jnp.ones(5, dtype),
        ])
        return jnp.concatenate([raw17, jnp.asarray([p_opt[17]], dtype)])

    def predict_one(p_norm, i_exp):
        """Posterior-predictive HRR curve for one particle/experiment."""
        w = p2vec_cathode(denormalise(p_norm))
        t_row = ts[i_exp]
        sol = odesolve(
            rhs, solver, u0, t_row[0], t_row[-1], t_row,
            args=(w, betas[i_exp]), rtol=cfg.rtol, atol=cfg.lb,
            max_steps=cfg.maxiters, unroll="scan",
        )
        ys = jnp.clip(sol.ys, 0.0, 10.0)
        return cathode_hrr(t_row, ys, w, betas[i_exp], cfg.lb)

    def loss_one(p_norm, i_exp):
        """Replicate-MSE likelihood loss (UQ network.jl:262-275)."""
        pred = predict_one(p_norm, i_exp)
        err = (pred[:, None] - reps[i_exp]) ** 2 * masks[i_exp][:, None]
        return jnp.sum(err) / n_rep / jnp.sum(masks[i_exp])

    use_batch_major = cfg.batch_major and cfg.solver == "rosenbrock23"
    if use_batch_major:
        from crnn_tpu.models.crnn import make_cathode_rhs_batch
        from crnn_tpu.ode.batch_solve import batch_odesolve_rb23

        f_b, f_jac_b = make_cathode_rhs_batch(cfg.lb)
        hrr_batch = jax.vmap(cathode_hrr, in_axes=(None, 0, 0, None, None))

        def loss_batch(p_norms, i_exp):
            """(B, 17) particles -> (B,) losses via ONE fused ensemble solve."""
            w_b = jax.vmap(p2vec_cathode)(jax.vmap(denormalise)(p_norms))
            t_row = ts[i_exp]
            u0b = jnp.broadcast_to(u0, (p_norms.shape[0], 3))
            sol = batch_odesolve_rb23(
                f_b, f_jac_b, u0b, t_row[0], t_row[-1], t_row,
                args=(w_b, betas[i_exp]), rtol=cfg.rtol, atol=cfg.lb,
                max_steps=cfg.maxiters, unroll="scan", nonautonomous=True)
            ys = jnp.clip(sol.ys, 0.0, 10.0)                 # (B, n_t, 3)
            pred = hrr_batch(t_row, ys, w_b, betas[i_exp], cfg.lb)
            err = ((pred[:, :, None] - reps[i_exp][None]) ** 2
                   * masks[i_exp][None, :, None])
            return jnp.sum(err, axis=(1, 2)) / n_rep / jnp.sum(masks[i_exp])

        def _loss_sum(p_norms, i_exp):
            losses = loss_batch(p_norms, i_exp)
            return jnp.sum(losses), losses

        def grad_all(p_norms, i_exp):
            # lanes are independent, so grad of the SUM is the per-particle
            # gradient stack — one reverse pass for the whole ensemble
            (_, losses), grads = jax.value_and_grad(
                _loss_sum, has_aux=True)(p_norms, i_exp)
            return losses, grads

        loss_all_fn = loss_batch
    else:
        grad_all = jax.vmap(jax.value_and_grad(loss_one), in_axes=(0, None))
        loss_all_fn = jax.vmap(loss_one, in_axes=(0, None))

    if cfg.dp:
        # particles sharded over the mesh: each device solves its shard,
        # two tiny all-gathers per iteration (parallel/svgd_dp.py)
        from crnn_tpu.parallel.mesh import make_mesh
        from crnn_tpu.parallel.svgd_dp import make_dp_svgd_step
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = cfg.dp if cfg.dp > 0 else len(jax.devices())
        if cfg.num_particles % n_dev:
            raise ValueError(
                f"num_particles={cfg.num_particles} must divide the "
                f"{n_dev}-device mesh for SVGD dp")
        mesh = make_mesh(n_dev)
        dp_step = make_dp_svgd_step(jax.value_and_grad(loss_one), mesh)

        def svgd_iteration(particles, i_exp, stepsize):
            return dp_step(particles, i_exp, stepsize, normalizer[i_exp])

        particles = jax.device_put(particles,
                                   NamedSharding(mesh, P("exp")))
        extras_mesh = mesh
    else:
        extras_mesh = None

    @jax.jit
    def _svgd_iteration_local(particles, i_exp, stepsize):
        losses, grads = grad_all(particles, i_exp)
        # noise normalisation of the score (dlnprob, network.jl:234-250)
        lnpgrad = -grads / normalizer[i_exp] ** 2
        # failed-solve tolerance (UQ network.jl:214: truncated solutions must
        # not crash the loop): a particle whose solve/gradient went non-finite
        # contributes no data force this iteration but still feels the kernel
        # repulsion, pushing it back toward the ensemble.
        finite = jnp.isfinite(lnpgrad).all(axis=1, keepdims=True)
        lnpgrad = jnp.where(finite, lnpgrad, 0.0)
        kxy, dxkxy = rbf_kernel(particles)
        phi = (kxy @ lnpgrad + dxkxy) / particles.shape[0]
        phi = jnp.where(jnp.isfinite(phi), phi, 0.0)
        return particles + stepsize * phi, jnp.nanmean(
            jnp.where(jnp.isfinite(losses), losses, jnp.nan))

    if not cfg.dp:
        svgd_iteration = _svgd_iteration_local

    extras = {
        "ts": ts, "reps": reps, "masks": masks, "betas": betas,
        "normalizer": normalizer, "loss_one": loss_one,
        "loss_all": loss_all_fn,
        "predict_one": predict_one, "denormalise": denormalise,
        "n_exp": n_exp, "p_scales": p_scales, "mesh": extras_mesh,
    }
    return particles, svgd_iteration, extras


def run_uq(cfg: CathodeUQConfig = CathodeUQConfig(),
           p_opt: Optional[np.ndarray] = None, verbose: bool = True,
           checkpoint_dir: Optional[str] = None,
           checkpoint_every: int = 2500, chunk: int = 0,
           resume: bool = False):
    """Full SVGD loop: per-iteration randperm over experiments, validation
    loss tracked without updates (crnn_cathode.jl:23-78).

    TPU-first iteration structure: the reference's inner experiment loop
    (4 training updates + 1 validation eval) is fused into ONE jitted call
    (lax.scan over the permutation), and per-update losses stay on device —
    on a remote-tunnel TPU a host sync per update costs a full round-trip,
    which dominated the per-iteration time (round-2 measurement: ~2 s/iter
    with per-update float() syncs vs ~0.7 s fused). One consequence: the
    validation loss is evaluated once AFTER all of the iteration's updates
    rather than at the val experiment's position inside the shuffled
    permutation (the reference interleaves it), so per-iteration loss
    curves are deterministic but not step-for-step identical to the
    reference's logs."""
    particles, svgd_iteration, ex = build_uq(cfg, p_opt)
    rng = np.random.default_rng(cfg.seed)
    history = ParticleHistory(cfg.gap)
    start_it, resumed_train, resumed_val = 0, [], []
    if resume and checkpoint_dir:
        # crash-resume: the tunneled TPU worker can die mid-run; restart
        # from the last periodic snapshot instead of iteration 0. The
        # stepsize schedule and history cadence are functions of the
        # absolute iteration index, so the resumed trajectory matches an
        # uninterrupted run except for the rng permutation stream (which
        # restarts — same distribution, different draws) and the particle
        # history entries lost between snapshot and crash.
        import os
        pf = os.path.join(checkpoint_dir, "particles_ckpt.npy")
        lf = os.path.join(checkpoint_dir, "losses_ckpt.npz")
        if os.path.exists(pf) and os.path.exists(lf):
            particles = jnp.asarray(np.load(pf))
            saved = np.load(lf)
            start_it = int(saved["it"])
            resumed_train = saved["loss_train"].tolist()
            resumed_val = saved["loss_val"].tolist()
            if verbose:
                print(f"resuming from {pf} at iter {start_it}", flush=True)
    loss_all = ex["loss_all"]
    val_index = cfg.val_index
    train_ids = np.asarray(
        [i for i in range(ex["n_exp"]) if i != val_index], np.int32)

    if chunk > 0:
        # dispatch-fused path: one jitted lax.scan advances `chunk` SVGD
        # iterations per host round-trip. On the tunneled TPU the
        # per-iteration dispatch latency dominated the unfused loop
        # (measured 14:03 round 3: 100-particle real-data iteration at
        # >1.4 s wall with ~0 device queue depth), so reference-scale
        # runs (25k iters) fuse. Particle snapshots are emitted per
        # iteration inside the chunk and subsampled on host, preserving
        # the exact `gap` history cadence.
        @jax.jit
        def run_chunk(particles, perms, stepsizes):
            def body(p, xs):
                perm, ss = xs
                p, mlosses = jax.lax.scan(
                    lambda q, i_exp: svgd_iteration(q, i_exp, ss), p, perm)
                val_loss = jnp.mean(loss_all(p, val_index))
                return p, (jnp.mean(mlosses), val_loss, p)
            return jax.lax.scan(body, particles, (perms, stepsizes))

        losses_train, losses_val = resumed_train, resumed_val
        it = start_it
        while it < cfg.n_iters:
            c = min(chunk, cfg.n_iters - it)
            perms = np.stack([rng.permutation(train_ids) for _ in range(c)])
            decays = np.arange(it, it + c) // cfg.stepsize_decay_epochs
            ss = cfg.stepsize * cfg.stepsize_decay ** decays
            particles, (mts, mvs, phist) = run_chunk(
                particles, jnp.asarray(perms),
                jnp.asarray(ss, particles.dtype))
            mts, mvs = np.asarray(mts), np.asarray(mvs)   # ONE bulk sync
            phist = np.asarray(phist)
            losses_train.extend(mts.tolist())
            losses_val.extend(mvs.tolist())
            for j in range(c):
                history.maybe_record(it + j, phist[j])
            it += c
            if verbose:
                print(f"svgd iter {it - 1}: train {losses_train[-1]:.4e} "
                      f"val {losses_val[-1]:.4e}", flush=True)
            if checkpoint_dir and (it % checkpoint_every < c
                                   or it == cfg.n_iters):
                import os
                os.makedirs(checkpoint_dir, exist_ok=True)
                np.save(os.path.join(checkpoint_dir, "particles_ckpt.npy"),
                        np.asarray(particles))
                np.savez(os.path.join(checkpoint_dir, "losses_ckpt.npz"),
                         loss_train=np.asarray(losses_train),
                         loss_val=np.asarray(losses_val), it=it)
        return particles, {
            "loss_train": losses_train,
            "loss_val": losses_val,
            "history": history.tensor(),
            "extras": ex,
        }

    @jax.jit
    def one_iteration(particles, perm, stepsize):
        def body(p, i_exp):
            p2, mloss = svgd_iteration(p, i_exp, stepsize)
            return p2, mloss
        particles, mlosses = jax.lax.scan(body, particles, perm)
        val_loss = jnp.mean(loss_all(particles, val_index))
        return particles, jnp.mean(mlosses), val_loss

    losses_train, losses_val = resumed_train, resumed_val
    pending = []       # device scalars, flushed in bulk (ONE transfer each)
    stepsize = cfg.stepsize * (
        cfg.stepsize_decay ** (start_it // cfg.stepsize_decay_epochs))

    def flush():
        if pending:
            arr = np.asarray(jnp.stack([jnp.stack(x) for x in pending]))
            losses_train.extend(arr[:, 0].tolist())
            losses_val.extend(arr[:, 1].tolist())
            pending.clear()

    for it in range(start_it, cfg.n_iters):
        perm = jnp.asarray(rng.permutation(train_ids))
        particles, mtrain, mval = one_iteration(particles, perm, stepsize)
        pending.append((mtrain, mval))
        history.maybe_record(it, particles)
        if (it + 1) % cfg.stepsize_decay_epochs == 0:
            stepsize *= cfg.stepsize_decay
        if verbose and it % max(cfg.n_iters // 10, 1) == 0:
            flush()
            print(f"svgd iter {it}: train {losses_train[-1]:.4e} "
                  f"val {losses_val[-1]:.4e}", flush=True)
        # periodic crash-safe snapshot: long reference-scale runs (25k
        # iters) must survive a kill — the reference checkpoints p_his
        # every gap iters too (UQ callback.jl:184)
        if checkpoint_dir and (it + 1) % checkpoint_every == 0:
            flush()
            import os
            os.makedirs(checkpoint_dir, exist_ok=True)
            np.save(os.path.join(checkpoint_dir, "particles_ckpt.npy"),
                    np.asarray(particles))
            np.savez(os.path.join(checkpoint_dir, "losses_ckpt.npz"),
                     loss_train=np.asarray(losses_train),
                     loss_val=np.asarray(losses_val), it=it + 1)
    flush()
    return particles, {
        "loss_train": losses_train,
        "loss_val": losses_val,
        "history": history.tensor(),
        "extras": ex,
    }


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--particles", type=int, default=100)
    ap.add_argument("--solver", default="rosenbrock23",
                    help="rosenbrock23 (default; batch-major fused-ensemble "
                         "likelihood, the fast TPU path) or trbdf2 (the "
                         "reference AutoTsit5(TRBDF2) analogue; posterior "
                         "consistency recorded in posterior_summary.md)")
    ap.add_argument("--no-batch-major", action="store_true",
                    help="force the per-lane vmap likelihood (A/B control "
                         "for the batch-major fused-ensemble path)")
    ap.add_argument("--dtype", default="float64",
                    help="working precision; float32 is the TPU-native "
                         "regime (f64 is emulated ~10x slower) — see "
                         "batch_major_consistency.md for the posterior check")
    ap.add_argument("--p-opt", default=None,
                    help="path to the deterministic optimum (p_opt.npy from "
                         "the cathode run) to warm-start the ensemble, as the "
                         "reference does (UQ network.jl:11)")
    ap.add_argument("--data-dir", default=None,
                    help="directory of UNCERT_cath_*.csv replicate curves "
                         "(the reference's measured data); omit for the "
                         "synthetic surrogate")
    ap.add_argument("--out", default="runs")
    ap.add_argument("--maxiters", type=int, default=512,
                    help="solver step budget; the real-data curves need ~217 "
                         "adaptive Rosenbrock steps at rtol 1e-4 (losses are "
                         "maxiters-converged at 256)")
    ap.add_argument("--decay-epochs", type=int, default=500,
                    help="stepsize decay cadence (UQ config.yaml:32: 0.95 "
                         "every 500 of 25000 iters = 50 decays over the run; "
                         "to traverse the same annealing schedule in fewer "
                         "iterations, shrink proportionally)")
    ap.add_argument("--dp", type=int, default=0,
                    help="shard the particle axis over N devices (-1 = all; "
                         "num_particles must divide the mesh)")
    ap.add_argument("--chunk", type=int, default=0,
                    help="fuse N SVGD iterations into one jitted dispatch "
                         "(remote-tunnel TPUs pay ~1 s dispatch latency per "
                         "host round-trip). Keep the fused program under "
                         "~10 s of device time: the tunneled worker "
                         "reproducibly crashed on ~40 s programs (chunk=100 "
                         "at 100 particles), so 10-25 is the safe range")
    ap.add_argument("--resume", action="store_true",
                    help="resume from the periodic snapshot in <out>/"
                         "cathode_uq/ if present (crash recovery)")
    ap.add_argument("--checkpoint-every", type=int, default=2500,
                    help="snapshot cadence in iterations; a kill between "
                         "snapshots loses at most this many iterations")
    args = ap.parse_args()
    cfg = CathodeUQConfig(n_iters=args.iters, num_particles=args.particles,
                          data_dir=args.data_dir, solver=args.solver,
                          stepsize_decay_epochs=args.decay_epochs,
                          maxiters=args.maxiters, dp=args.dp,
                          batch_major=not args.no_batch_major,
                          dtype=args.dtype)
    p_opt = np.load(args.p_opt) if args.p_opt else None
    import os

    particles, info = run_uq(
        cfg, p_opt=p_opt,
        checkpoint_dir=os.path.join(args.out, "cathode_uq"),
        checkpoint_every=args.checkpoint_every,
        chunk=args.chunk, resume=args.resume)

    from crnn_tpu.uq.posterior import (
        animate_particle_evolution, plot_correlation_heatmap,
        plot_particle_histograms, plot_posterior_band, posterior_moments,
    )

    out = os.path.join(args.out, "cathode_uq")
    os.makedirs(out, exist_ok=True)
    np.save(os.path.join(out, "particles.npy"), np.asarray(particles))
    np.savez(os.path.join(out, "losses.npz"),
             loss_train=info["loss_train"], loss_val=info["loss_val"])
    names = ([f"lnA{i}" for i in range(1, 4)] + [f"Ea{i}" for i in range(1, 4)]
             + [f"b{i}" for i in range(1, 4)] + [f"dH{i}" for i in range(1, 4)]
             + [f"n{i}" for i in range(1, 4)] + ["nu2", "nu3"])
    plot_correlation_heatmap(np.asarray(particles),
                             os.path.join(out, "corr.png"), names)
    plot_particle_histograms(np.asarray(particles),
                             os.path.join(out, "hist.png"), names)
    # posterior predictive +/-4 sigma bands per heating rate
    # (post_Plotting.jl:90-199, the reference's headline UQ figure)
    ex = info["extras"]
    predict_jit = jax.jit(ex["predict_one"])
    for i in range(ex["n_exp"]):
        n = int(np.sum(np.asarray(ex["masks"][i])))
        plot_posterior_band(
            np.asarray(ex["ts"][i])[:n],
            np.asarray(ex["reps"][i]).mean(axis=1)[:n],
            lambda p, i=i, n=n: predict_jit(p, jnp.asarray(i))[:n],
            np.asarray(particles),
            os.path.join(out, f"band_beta{int(ex['betas'][i])}.png"),
        )
    if info["history"].size:
        animate_particle_evolution(info["history"],
                                   os.path.join(out, "evolution.gif"))
    m = posterior_moments(np.asarray(particles))
    print("posterior std per param:", np.round(m["std"], 4))

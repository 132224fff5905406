"""Training loop: jitted epochs over vmapped experiment losses.

Rebuilds the reference's epoch loop (case2/case2.jl:192-207):

    for epoch: for i_exp in randperm(n_train): grad -> clip -> update!
               then evaluate the loss of EVERY experiment; callback.

Two execution modes, both fully on-device:

- ``mode='sequential'`` — faithful to the reference's per-experiment SGD
  (batch size = 1 experiment): a ``lax.scan`` over the shuffled experiment
  indices, one optimizer update per experiment. Same optimisation dynamics,
  but compiled: each update's solve+gradient runs as one XLA program.
- ``mode='batch'`` — TPU-first: ONE update per epoch on the mean loss over
  all training experiments, whose per-experiment solves run batched under
  ``vmap`` (the 10x-throughput design of SURVEY.md §2.2 "Training loop").

The full-dataset evaluation pass (reference re-solves all experiments
serially every epoch, case2.jl:199-201) is always a single vmapped solve.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from crnn_tpu.train.loss import prefix_mask


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    epoch: jnp.ndarray
    key: jnp.ndarray


class EpochMetrics(NamedTuple):
    loss_train: jnp.ndarray
    loss_val: jnp.ndarray
    grad_norm: jnp.ndarray
    loss_exp: jnp.ndarray  # (n_exp,) per-experiment losses


class BestState(NamedTuple):
    """On-device best-so-far carry for Trainer.guarded_epoch_fn."""

    params: Any
    loss_val: jnp.ndarray    # best val loss seen (f32 scalar)
    loss_train: jnp.ndarray  # train loss at the best-val epoch
    n_skipped: jnp.ndarray   # epochs whose update was discarded (non-finite)


@dataclass
class Trainer:
    """loss_i_exp(params, i_exp, horizon_mask) -> scalar experiment loss."""

    loss_i_exp: Callable
    optimizer: optax.GradientTransformation
    n_exp_train: int
    n_exp: int
    n_save: int
    mode: str = "sequential"
    # stochastic prefix horizons: (min_sample, max_sample) or None
    horizon_range: Optional[Tuple[int, int]] = None
    # experiments visited by the update loop; defaults to n_exp_train.
    # case3 updates on ALL experiments incl. the validation split
    # (case3/case3.jl:263) — set n_exp_update=n_exp to mirror that quirk.
    n_exp_update: Optional[int] = None
    # gradient-free loss for the evaluation pass (e.g. built on the
    # early-exiting while-loop solver driver); defaults to loss_i_exp
    loss_i_exp_eval: Optional[Callable] = None
    # gradient mode: 'rev' (reverse through the scan driver — default) or
    # 'fwd' (jacfwd through the while driver — the ForwardDiff.gradient
    # analogue, case2/case2.jl:195; wins for small parameter counts like
    # Cathode's 18 because the while loop exits early)
    grad_mode: str = "rev"
    # batch-major whole-batch losses (ode/batch_solve.py + Pallas fused
    # kernels): loss_batch(params, idxs (n,), masks (n, n_save)) -> (n,)
    # per-experiment losses. When set, 'batch' mode updates and the eval
    # pass run through it instead of vmapping loss_i_exp.
    loss_batch: Optional[Callable] = None
    loss_batch_eval: Optional[Callable] = None

    def init(self, params, seed: int = 0) -> TrainState:
        return TrainState(
            params=params,
            opt_state=self.optimizer.init(params),
            epoch=jnp.asarray(0, jnp.int32),
            key=jax.random.PRNGKey(seed),
        )

    # -- internals ----------------------------------------------------------

    def _sample_masks(self, key, n: int, dtype):
        if self.horizon_range is None:
            return jnp.ones((n, self.n_save), dtype)
        lo, hi = self.horizon_range
        samples = jax.random.randint(key, (n,), lo, hi + 1)
        return jax.vmap(lambda s: prefix_mask(self.n_save, s, dtype))(samples)

    def _value_and_grad(self):
        """(params, i_exp, mask) -> (loss, grad) in the configured mode."""
        if self.grad_mode == "fwd":
            loss_fn = self.loss_i_exp_eval or self.loss_i_exp

            def vag(params, idx, mask):
                loss = loss_fn(params, idx, mask)
                g = jax.jacfwd(lambda p: loss_fn(p, idx, mask))(params)
                return loss, g

            return vag
        return jax.value_and_grad(self.loss_i_exp)

    def _epoch(self, state: TrainState) -> Tuple[TrainState, EpochMetrics]:
        key, k_perm, k_hor = jax.random.split(state.key, 3)
        dtype = jnp.result_type(jax.tree.leaves(state.params)[0].dtype)
        n_upd = self.n_exp_update or self.n_exp_train
        perm = jax.random.permutation(k_perm, n_upd)
        masks = self._sample_masks(k_hor, n_upd, dtype)

        vag = self._value_and_grad()
        if self.mode == "sequential":
            def step(carry, xs):
                params, opt_state = carry
                idx, mask = xs
                loss, g = vag(params, idx, mask)
                gnorm = optax.global_norm(g)
                updates, opt_state = self.optimizer.update(g, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), gnorm

            (params, opt_state), gnorms = jax.lax.scan(
                step, (state.params, state.opt_state), (perm, masks)
            )
            grad_norm = jnp.mean(gnorms)
        elif self.mode == "batch":
            if self.loss_batch is not None and self.grad_mode == "fwd":
                # forward-mode (ForwardDiff analogue) through the batch-major
                # EARLY-EXIT while driver: at np ~ 25 the tangent batch is
                # cheap and the while loop stops at the true step count,
                # where the reverse path pays max_steps remat replay
                loss_fn = self.loss_batch_eval or self.loss_batch

                def mean_loss(params):
                    return jnp.mean(loss_fn(params, perm, masks))

                g = jax.jacfwd(mean_loss)(state.params)
            elif self.loss_batch is not None:
                def mean_loss(params):
                    return jnp.mean(self.loss_batch(params, perm, masks))

                _, g = jax.value_and_grad(mean_loss)(state.params)
            elif self.grad_mode == "fwd":
                loss_fn = self.loss_i_exp_eval or self.loss_i_exp

                def mean_loss(params):
                    losses = jax.vmap(
                        lambda i, m: loss_fn(params, i, m)
                    )(perm, masks)
                    return jnp.mean(losses)

                g = jax.jacfwd(mean_loss)(state.params)
            else:
                def mean_loss(params):
                    losses = jax.vmap(
                        lambda i, m: self.loss_i_exp(params, i, m)
                    )(perm, masks)
                    return jnp.mean(losses)

                _, g = jax.value_and_grad(mean_loss)(state.params)
            grad_norm = optax.global_norm(g)
            updates, opt_state = self.optimizer.update(
                g, state.opt_state, state.params
            )
            params = optax.apply_updates(state.params, updates)
        else:
            raise ValueError(f"unknown mode {self.mode!r}")

        # full evaluation pass: every experiment, full horizon, batched
        eval_batch = self.loss_batch_eval or self.loss_batch
        if eval_batch is not None:
            loss_exp = eval_batch(
                params, jnp.arange(self.n_exp),
                jnp.ones((self.n_exp, self.n_save), dtype),
            )
        else:
            eval_loss = self.loss_i_exp_eval or self.loss_i_exp
            eval_mask = jnp.ones((self.n_save,), dtype)
            loss_exp = jax.vmap(
                lambda i: eval_loss(params, i, eval_mask)
            )(jnp.arange(self.n_exp))
        loss_train = jnp.mean(loss_exp[: self.n_exp_train])
        if self.n_exp > self.n_exp_train:
            loss_val = jnp.mean(loss_exp[self.n_exp_train:])
        else:
            # no held-out split (HyChem trains one trajectory): report train
            loss_val = loss_train

        new_state = TrainState(params, opt_state, state.epoch + 1, key)
        return new_state, EpochMetrics(loss_train, loss_val, grad_norm, loss_exp)

    # -- public API ----------------------------------------------------------

    def epoch_fn(self) -> Callable:
        """The jitted (state) -> (state, metrics) single-epoch function."""
        return jax.jit(self._epoch)

    def init_best(self, state: TrainState) -> "BestState":
        """Initial best-params carry for guarded_epoch_fn."""
        return BestState(
            params=state.params,
            loss_val=jnp.asarray(jnp.inf, jnp.float32),
            loss_train=jnp.asarray(jnp.inf, jnp.float32),
            n_skipped=jnp.asarray(0, jnp.int32),
        )

    def guarded_epoch_fn(self) -> Callable:
        """Epoch step with on-device best-val tracking + NaN divergence guard.

        Rebuilds the reference callback's best-so-far parameter snapshot
        (Cathode/src/callback.jl:122-126) without per-epoch host syncs: the
        best carry lives on-device and is folded with `where`. Additionally
        (the reference has no equivalent, but its absence destroyed the
        round-3 hychem artifact): if an epoch produces a non-finite train
        loss or grad norm, the parameter/optimizer update is DISCARDED —
        params and opt_state revert to their pre-epoch values — so one bad
        step cannot poison the rest of the run.

        Returns jitted (state, best) -> (state, best, metrics).
        """
        return jax.jit(self._guarded_step)

    def _guarded_step(self, state: TrainState, best: BestState):
        new_state, m = self._epoch(state)
        ok = jnp.isfinite(m.loss_train) & jnp.isfinite(m.grad_norm)

        def keep(a, b):
            return jnp.where(ok, a, b)

        params = jax.tree.map(keep, new_state.params, state.params)
        opt_state = jax.tree.map(keep, new_state.opt_state, state.opt_state)
        new_state = TrainState(params, opt_state, new_state.epoch,
                               new_state.key)

        is_best = ok & (m.loss_val < best.loss_val)
        best = BestState(
            params=jax.tree.map(
                lambda b, p: jnp.where(is_best, p, b), best.params, params),
            loss_val=jnp.where(is_best, m.loss_val.astype(jnp.float32),
                               best.loss_val),
            loss_train=jnp.where(is_best, m.loss_train.astype(jnp.float32),
                                 best.loss_train),
            n_skipped=best.n_skipped + jnp.where(ok, 0, 1).astype(jnp.int32),
        )
        return new_state, best, m

    def epochs_fn(self, k: int) -> Callable:
        """Jitted (state) -> (state, metrics) running ``k`` epochs in ONE
        dispatch via ``lax.scan``.

        TPU-native throughput feature with no reference counterpart (the
        reference's epoch loop is a host-side ``for`` — case2/case2.jl:192):
        on a tunnelled/remote accelerator the per-dispatch host→device
        latency is the epoch-time floor once the on-chip work is a few ms,
        so fusing k epochs into one program amortises it k-fold for the
        reference's 10k–25k-epoch protocols. Metrics come back stacked with
        a leading (k,) axis, so per-epoch history is preserved exactly.
        """

        def run(state: TrainState):
            def body(s, _):
                s, m = self._epoch(s)
                return s, m

            return jax.lax.scan(body, state, None, length=k)

        return jax.jit(run)

    def guarded_epochs_fn(self, k: int) -> Callable:
        """k-epoch fused variant of guarded_epoch_fn: jitted
        (state, best) -> (state, best, metrics stacked over k).

        The divergence guard and on-device best-val carry fold INSIDE the
        scan, so a non-finite epoch mid-chunk is discarded and the best
        parameters are tracked at per-epoch granularity exactly as in the
        single-dispatch path."""
        def run(state: TrainState, best: BestState):
            def body(carry, _):
                s, b = carry
                s, b, m = self._guarded_step(s, b)
                return (s, b), m

            (state2, best2), ms = jax.lax.scan(
                body, (state, best), None, length=k)
            return state2, best2, ms

        return jax.jit(run)

    def fit(self, state: TrainState, n_epochs: int,
            callback: Optional[Callable] = None,
            callback_every: int = 1,
            epochs_per_dispatch: int = 1) -> Tuple[TrainState, dict]:
        """Run n_epochs; callback(epoch, state, metrics) on the host every
        ``callback_every`` epochs (the reference's cb/cbi layer).

        ``epochs_per_dispatch`` > 1 runs epochs in fused chunks (one XLA
        dispatch per chunk, see epochs_fn); callbacks then fire at chunk
        boundaries with the final epoch's metrics."""
        history = {"loss_train": [], "loss_val": [], "grad_norm": []}
        k = max(1, int(epochs_per_dispatch))
        if k > 1:
            step_k = self.epochs_fn(k)
            done = 0
            while done < n_epochs:
                if n_epochs - done >= k:
                    state, ms = step_k(state)
                    ran = k
                else:
                    ran = n_epochs - done
                    state, ms = self.epochs_fn(ran)(state)
                lt, lv, gn = jax.device_get(
                    (ms.loss_train, ms.loss_val, ms.grad_norm))
                history["loss_train"].extend(float(x) for x in lt)
                history["loss_val"].extend(float(x) for x in lv)
                history["grad_norm"].extend(float(x) for x in gn)
                done += ran
                if callback is not None and (
                        done % callback_every == 0 or done == n_epochs):
                    last = jax.tree.map(lambda a: a[-1], ms)
                    callback(done - 1, state, last)
            return state, history
        step = self.epoch_fn()
        for e in range(n_epochs):
            state, m = step(state)
            history["loss_train"].append(float(m.loss_train))
            history["loss_val"].append(float(m.loss_val))
            history["grad_norm"].append(float(m.grad_norm))
            if callback is not None and (e + 1) % callback_every == 0:
                callback(e, state, m)
        return state, history

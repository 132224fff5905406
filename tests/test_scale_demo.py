"""Scale demonstration: 256 case3-sized experiments sharded over the
8-device virtual mesh, loss/gradient-parity with the single-device path.

This regression-guards the driver's multichip dryrun (__graft_entry__.py)
at a realistic batch scale: the data-parallel train step must produce the
same global loss and the same updated parameters as an unsharded
whole-batch step, with experiments distributed over the mesh's 'exp' axis
and gradients reduced over ICI (psum).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from crnn_tpu.data.truth import CASE3_K, case3_truth
from crnn_tpu.models.crnn import make_crnn_scaled_rhs
from crnn_tpu.ode import Tsit5, odesolve
from crnn_tpu.parallel.dp import make_dp_eval, make_dp_train_step
from crnn_tpu.parallel.mesh import make_mesh
from crnn_tpu.transforms.p2vec import init_params_case3, p2vec_case3

N_EXP = 256
NS, NR = 9, 8
N_SAVE = 12
T1 = 2.0


@pytest.fixture(scope="module")
def problem():
    dtype = jnp.float64   # reduction-order noise in f32 obscures the parity
    key = jax.random.PRNGKey(0)
    k_u0, k_p = jax.random.split(key)
    u0 = 10.0 ** (jax.random.uniform(k_u0, (N_EXP, NS), dtype) * -2.0)
    saveat = jnp.linspace(0.0, T1, N_SAVE, dtype=dtype)

    # ground-truth trajectories as the fitting target
    def truth_one(u0_i):
        sol = odesolve(case3_truth, Tsit5(), u0_i, 0.0, T1, saveat,
                       args=CASE3_K.astype(dtype), rtol=1e-6, atol=1e-8,
                       max_steps=256, unroll="while")
        return sol.ys

    ys = jax.vmap(truth_one)(u0)
    dydt_scale = jnp.ones((NS,), dtype)
    rhs = make_crnn_scaled_rhs(1e-5, 100.0, dydt_scale)

    def loss_on_data(p, u0_i, ys_i, mask_i):
        # tight tolerances: a knife-edge accept/reject flip between two
        # compilations of the adaptive solver perturbs that lane's gradient
        # by ~rtol, so parity assertions need well-converged solves
        w = p2vec_case3(p, NS, NR)
        sol = odesolve(rhs, Tsit5(), u0_i, 0.0, T1, saveat, args=w,
                       rtol=1e-5, atol=1e-8, max_steps=256, unroll="scan")
        pred = jnp.clip(sol.ys, 1e-5, 100.0)
        return jnp.sum(jnp.abs(pred - ys_i) * mask_i[:, None]) / (
            jnp.sum(mask_i) * NS)

    p0 = init_params_case3(k_p, NS, NR, dtype=dtype)
    masks = jnp.ones((N_EXP, N_SAVE), dtype)
    return loss_on_data, p0, u0, ys, masks


def test_256_experiments_sharded_over_8_devices(problem):
    loss_on_data, p0, u0, ys, masks = problem
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest must force the 8-device virtual CPU mesh"
    mesh = make_mesh(n_dev)
    optimizer = optax.adam(1e-3)

    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh, P("exp"))
    u0_s = jax.device_put(u0, shard)
    ys_s = jax.device_put(ys, shard)
    masks_s = jax.device_put(masks, shard)
    weights = jax.device_put(jnp.ones((N_EXP,)), shard)

    # single-device reference first: the dp step donates (deletes) its
    # params/opt_state buffers
    def mean_loss(p):
        return jnp.mean(jax.vmap(loss_on_data, in_axes=(None, 0, 0, 0))(
            p, u0, ys, masks))

    loss_ref, g_ref = jax.value_and_grad(mean_loss)(p0)
    updates, _ = optimizer.update(g_ref, optimizer.init(p0), p0)
    p_ref = optax.apply_updates(p0, updates)

    step = make_dp_train_step(loss_on_data, optimizer, mesh)
    p_dp, opt_dp, loss_dp, gnorm_dp = step(
        jnp.array(p0), optimizer.init(p0), u0_s, ys_s, masks_s, weights)

    np.testing.assert_allclose(float(loss_dp), float(loss_ref), rtol=1e-5)
    np.testing.assert_allclose(float(gnorm_dp), float(optax.global_norm(g_ref)),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(p_dp), np.asarray(p_ref),
                               rtol=1e-4, atol=1e-7)

    # sharded eval parity
    eval_fn = make_dp_eval(loss_on_data, mesh)
    losses_dp = eval_fn(p_dp, u0_s, ys_s, masks_s)
    losses_ref = jax.vmap(loss_on_data, in_axes=(None, 0, 0, 0))(
        p_ref, u0, ys, masks)
    assert losses_dp.shape == (N_EXP,)
    np.testing.assert_allclose(np.asarray(losses_dp), np.asarray(losses_ref),
                               rtol=1e-4, atol=1e-6)

"""SVGD engine tests: kernel identities + posterior recovery on a Gaussian."""

import jax
import jax.numpy as jnp
import numpy as np

from crnn_tpu.uq.svgd import SVGDConfig, make_svgd_step, rbf_kernel, svgd_step


def test_rbf_kernel_identities():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (20, 3))
    kxy, dxkxy = rbf_kernel(x, bandwidth=0.7)
    np.testing.assert_allclose(np.asarray(jnp.diag(kxy)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(kxy), np.asarray(kxy.T), rtol=1e-6)
    # analytic repulsion vs autodiff: dxkxy[i] = sum_j d/dx_j k(x_j, x_i)
    # with x_i held FIXED as the kernel's second argument
    h = 0.7
    for i in [0, 7]:
        xi = x[i]

        def ksum(xj_flat):
            xj = xj_flat.reshape(20, 3)
            d2 = jnp.sum((xj - xi) ** 2, axis=-1)
            return jnp.sum(jnp.exp(-d2 / (2 * h)))

        g = jax.grad(ksum)(x.reshape(-1)).reshape(20, 3)
        expected = g.sum(axis=0)
        np.testing.assert_allclose(np.asarray(dxkxy[i]), np.asarray(expected),
                                   rtol=1e-5, atol=1e-6)


def test_svgd_recovers_gaussian():
    """Particles driven by the score of N(mu, sigma^2 I) match its moments."""
    mu = jnp.array([1.0, -2.0])
    sigma = 0.5

    def grad_logp(particles):
        return jax.vmap(lambda x: -(x - mu) / sigma**2)(particles)

    key = jax.random.PRNGKey(1)
    particles = jax.random.normal(key, (200, 2)) * 2.0 + 3.0
    step = make_svgd_step(grad_logp, SVGDConfig(stepsize=5e-2))
    for _ in range(2500):
        particles = step(particles)
    m = np.asarray(jnp.mean(particles, axis=0))
    s = np.asarray(jnp.std(particles, axis=0))
    np.testing.assert_allclose(m, np.asarray(mu), atol=0.05)
    np.testing.assert_allclose(s, sigma, atol=0.1)


def test_svgd_step_moves_toward_mode():
    def grad_logp(particles):
        return -particles  # standard normal score

    x = jnp.ones((10, 2)) * 3.0 + jax.random.normal(jax.random.PRNGKey(2), (10, 2)) * 0.1
    x2 = svgd_step(x, grad_logp(x), stepsize=0.1)
    assert float(jnp.mean(jnp.abs(x2))) < float(jnp.mean(jnp.abs(x)))


def test_cathode_uq_f32_build_and_step():
    """The float32 (TPU-native) UQ build: dtype threads end-to-end and one
    batch-major SVGD step stays finite and moves the ensemble."""
    from crnn_tpu.cases.cathode_uq import CathodeUQConfig, build_uq

    cfg = CathodeUQConfig(num_particles=4, dtype="float32")
    particles, step, ex = build_uq(cfg)
    assert particles.dtype == jnp.float32
    assert ex["p_scales"].dtype == jnp.float32
    assert ex["reps"].dtype == jnp.float32
    new_p, loss = step(particles, jnp.asarray(0), 2e-4)
    assert new_p.dtype == jnp.float32
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(new_p)))
    assert float(jnp.max(jnp.abs(new_p - particles))) > 0.0

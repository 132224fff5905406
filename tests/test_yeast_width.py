"""mlp_width capacity knob (cases/yeast.py) must preserve the hybrid
contract: widening the three hidden layers changes only internal shapes,
never the observed->hidden output arity (ns_ - ns = 5,
yeast_glycolysis.jl:128-133 analogue) or loss finiteness."""

import jax
import jax.numpy as jnp
import numpy as np


def _small(width):
    from crnn_tpu.cases.yeast import YeastConfig, build

    cfg = YeastConfig(n_exp_train=2, n_exp_val=1, ntotal=16, max_steps=96,
                      mlp_width=width)
    return cfg, build(cfg)


def test_width_zero_is_reference_structure():
    cfg, setup = _small(0)
    node = cfg.ns_ - cfg.ns
    ws = [layer["w"].shape for layer in setup.init_params["mlp"]]
    assert ws == [(node, cfg.ns), (node, node), (node, node), (node, node)]


def test_wide_mlp_shapes_and_loss_finite():
    cfg, setup = _small(16)
    node = cfg.ns_ - cfg.ns
    ws = [layer["w"].shape for layer in setup.init_params["mlp"]]
    assert ws == [(16, cfg.ns), (16, 16), (16, 16), (node, 16)]
    mask = jnp.ones((cfg.ntotal,), jnp.float32)
    val = float(setup.trainer.loss_i_exp(setup.init_params,
                                         jnp.asarray(0), mask))
    assert np.isfinite(val)


def test_wide_mlp_grad_finite():
    cfg, setup = _small(16)
    mask = jnp.ones((cfg.ntotal,), jnp.float32)
    g = jax.grad(lambda p: setup.trainer.loss_i_exp(p, jnp.asarray(0),
                                                    mask))(setup.init_params)
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()

"""CBAM layer-stack attention (reference zoo pattern) behavioral tests."""

import numpy as np

import jax
import jax.numpy as jnp

from rade_tpu.nn.cbam import CBAMAttention
from rade_tpu.nn.wavlm import WavLMConfig, WavLMFrontend


def test_cbam_shapes_and_bounded_scaling():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 3, 10, 16).astype(np.float32))
    mod = CBAMAttention(reduction=4)
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x)
    assert y.shape == x.shape
    # both gates are sigmoids: |y| <= |x| elementwise
    assert np.all(np.abs(np.asarray(y)) <= np.abs(np.asarray(x)) + 1e-6)


def test_cbam_grads_flow_to_both_branches():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 3, 8, 16).astype(np.float32))
    mod = CBAMAttention(reduction=4)
    params = mod.init(jax.random.PRNGKey(0), x)

    g = jax.grad(lambda p: jnp.sum(mod.apply(p, x) ** 2))(params)
    for name in ("channel_fc1", "channel_fc2", "spatial_conv"):
        leaf = np.asarray(jax.tree.leaves(g["params"][name])[0])
        assert np.abs(leaf).sum() > 0, name


def test_wavlm_frontend_cbam_weighting():
    cfg = WavLMConfig.tiny()
    fe = WavLMFrontend(cfg, weighting="cbam")
    x = jnp.zeros((2, 3200), jnp.float32)
    variables = fe.init(jax.random.PRNGKey(0), x)
    assert "cbam" in variables["params"]
    out = fe.apply(variables, x, train=False)
    assert out.shape[0] == 2 and out.shape[2] == cfg.hidden_size

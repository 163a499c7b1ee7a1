"""Fused Pallas residual-block kernel vs the jnp reference and flax module."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from rade_tpu.kernels.resblock import fused_resblock, resblock_ref
from rade_tpu.nn.blocks import ResBlock2D


def _params(rng, cin, cout):
    p = {
        "w1": rng.randn(2, 3, cin, cout).astype(np.float32) * 0.2,
        "b1": rng.randn(cout).astype(np.float32) * 0.1,
        "bn_scale": 1.0 + 0.1 * rng.randn(cout).astype(np.float32),
        "bn_bias": 0.1 * rng.randn(cout).astype(np.float32),
        "bn_mean": 0.1 * rng.randn(cout).astype(np.float32),
        "bn_var": (1.0 + 0.2 * rng.rand(cout)).astype(np.float32),
        "w2": rng.randn(2, 3, cout, cout).astype(np.float32) * 0.2,
        "b2": rng.randn(cout).astype(np.float32) * 0.1,
    }
    if cin != cout:
        p["wd"] = rng.randn(1, 3, cin, cout).astype(np.float32) * 0.2
        p["bd"] = rng.randn(cout).astype(np.float32) * 0.1
    return p


@pytest.mark.parametrize(
    "H,W,cin,cout,wt",
    [
        (5, 100, 4, 4, 24),    # identity shortcut, ragged W
        (5, 96, 4, 8, 24),     # downsample shortcut, exact tiles
        (7, 30, 1, 8, 24),     # single-channel input (block 0), one tile
        (5, 49, 8, 8, 48),     # tile bigger than W
    ],
)
def test_fused_matches_reference(H, W, cin, cout, wt):
    rng = np.random.RandomState(H + W + cin)
    x = jnp.asarray(rng.randn(2, H, W, cin).astype(np.float32) * 0.5)
    p = {k: jnp.asarray(v) for k, v in _params(rng, cin, cout).items()}

    want = resblock_ref(x, **p)
    with pltpu.force_tpu_interpret_mode():
        got = fused_resblock(x, **p, wt=wt)
    assert got.shape == want.shape == (2, H, W // 3, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_reference_matches_flax_module():
    """resblock_ref is the executable spec: it must equal ResBlock2D (eval)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 6, 60, 4).astype(np.float32) * 0.5)
    block = ResBlock2D(in_ch=4, out_ch=8)
    variables = block.init(jax.random.PRNGKey(0), x)
    out_flax = block.apply(variables, x, False, False)

    pr, st = variables["params"], variables["batch_stats"]
    out_ref = resblock_ref(
        x,
        pr["conv1"]["kernel"], pr["conv1"]["bias"],
        pr["bn2"]["scale"], pr["bn2"]["bias"],
        st["bn2"]["mean"], st["bn2"]["var"],
        pr["conv2"]["kernel"], pr["conv2"]["bias"],
        pr["conv_downsample"]["kernel"], pr["conv_downsample"]["bias"],
    )
    np.testing.assert_allclose(
        np.asarray(out_ref), np.asarray(out_flax), rtol=1e-5, atol=1e-5
    )


def test_fused_bf16_io():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 5, 72, 4).astype(np.float32)).astype(jnp.bfloat16)
    p = {k: jnp.asarray(v) for k, v in _params(rng, 4, 4).items()}
    want = resblock_ref(x, **p)
    with pltpu.force_tpu_interpret_mode():
        got = fused_resblock(x, **p, wt=24)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )

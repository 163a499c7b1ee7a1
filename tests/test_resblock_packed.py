"""Packed-lane fused residual block (v2) vs the jnp reference."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from rade_tpu.kernels.resblock import resblock_ref
from rade_tpu.kernels.resblock_packed import (
    fused_resblock_packed,
    pack_hwc,
    resblock_chain_packed,
    unpack_hwc,
)


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


def test_pack_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 30, 4).astype(np.float32))
    p = pack_hwc(x)
    assert p.shape == (2, 30, 128)
    np.testing.assert_array_equal(np.asarray(unpack_hwc(p, 5, 4)), np.asarray(x))


@pytest.mark.parametrize(
    "H,W,cin,cout,wt",
    [
        (5, 100, 4, 4, 24),    # identity shortcut, ragged W
        (5, 96, 4, 8, 24),     # downsample shortcut, exact tiles
        (7, 30, 1, 8, 24),     # single-channel input (block 0), one tile
        (5, 49, 8, 8, 48),     # tile bigger than W
        (23, 72, 8, 8, 24),    # H*C spans > 1 lane tile (23*8=184)
        (23, 48, 8, 16, 24),   # multi-tile with channel growth
    ],
)
def test_packed_matches_reference(H, W, cin, cout, wt):
    rng = np.random.RandomState(H + W + cin + cout)
    x = jnp.asarray(rng.randn(2, H, W, cin).astype(np.float32) * 0.5)
    p = {k: jnp.asarray(v) for k, v in _params(rng, cin, cout).items()}

    want = resblock_ref(x, **p)
    with pltpu.force_tpu_interpret_mode():
        got_packed = fused_resblock_packed(pack_hwc(x), H, **p, wt=wt, w_true=W)
    got = unpack_hwc(got_packed[:, : W // 3, :], H, cout)
    assert got.shape == want.shape == (2, H, W // 3, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_chain_matches_reference():
    """Two chained blocks stay in the packed layout between blocks."""
    rng = np.random.RandomState(7)
    H, W = 5, 99
    x = jnp.asarray(rng.randn(2, H, W, 1).astype(np.float32) * 0.5)
    p0 = {k: jnp.asarray(v) for k, v in _params(rng, 1, 8).items()}
    p1 = {k: jnp.asarray(v) for k, v in _params(rng, 8, 8).items()}

    want = resblock_ref(resblock_ref(x, **p0), **p1)
    with pltpu.force_tpu_interpret_mode():
        got = resblock_chain_packed(x, [p0, p1], wt_table=[24, 24])
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4)


def test_packed_bf16_io():
    rng = np.random.RandomState(3)
    H, W, cin, cout = 5, 72, 4, 4
    x = jnp.asarray(rng.randn(1, H, W, cin).astype(np.float32)).astype(jnp.bfloat16)
    p = {k: jnp.asarray(v) for k, v in _params(rng, cin, cout).items()}
    want = resblock_ref(x, **p)
    with pltpu.force_tpu_interpret_mode():
        got_packed = fused_resblock_packed(pack_hwc(x), H, **p, wt=24, w_true=W)
    got = unpack_hwc(got_packed[:, : W // 3, :], H, cout)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2,
    )

"""Fused eval-path attention: fallback parity + flag plumbing.

On CPU `fused_bias_attention` uses the reference einsum (the Mosaic kernel
needs a real TPU); TPU-side numerics/latency are checked by
`benchmarks/check_flash_attention.py`.
"""

import numpy as np

import jax
import jax.numpy as jnp

from rade_tpu.kernels.attention import (
    fused_bias_attention,
    reference_bias_attention,
)


def _qkvb(B=2, H=4, L=10, hd=8, bias=True, seed=0):
    r = np.random.RandomState(seed)
    q = jnp.asarray(r.randn(B, H, L, hd).astype(np.float32)) * hd**-0.5
    k = jnp.asarray(r.randn(B, H, L, hd).astype(np.float32))
    v = jnp.asarray(r.randn(B, H, L, hd).astype(np.float32))
    b = jnp.asarray(r.randn(B, H, L, L).astype(np.float32)) if bias else None
    return q, k, v, b


def test_reference_matches_manual_softmax():
    q, k, v, b = _qkvb()
    out = reference_bias_attention(q, k, v, b)
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) + b
    want = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), rtol=1e-6)


def test_fused_fallback_cpu():
    for bias in (True, False):
        q, k, v, b = _qkvb(bias=bias, seed=3)
        got = fused_bias_attention(q, k, v, b)
        want = reference_bias_attention(q, k, v, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_wavlm_flag_plumbing_eval_parity():
    """flash_attention=True must not change eval outputs (CPU fallback path
    is the same math; this guards the flag wiring and train-path gating)."""
    from rade_tpu.nn.wavlm import WavLMConfig, WavLMModel

    x = jnp.asarray(np.random.RandomState(0).randn(2, 4800).astype(np.float32))
    outs = []
    for flag in (False, True):
        cfg = WavLMConfig.tiny(flash_attention=flag)
        model = WavLMModel(cfg)
        params = model.init(jax.random.PRNGKey(0), x, train=False)
        last, _ = model.apply(params, x, train=False)
        outs.append(np.asarray(last))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-6)


def test_flagship_from_config_plumbs_flag():
    from rade_tpu.models.dual_stream_se_mamba import DualStreamSEMamba

    m = DualStreamSEMamba.from_config(
        {"wavlm_variant": "tiny", "wavlm_flash_attention": True}
    )
    assert m.wavlm_cfg.flash_attention is True
    m2 = DualStreamSEMamba.from_config({"wavlm_variant": "tiny"})
    assert m2.wavlm_cfg.flash_attention is False


def test_block_sizes_divide_padded_length():
    """Regression: the kernel requires block | sequence; every padded length
    (multiples of 128) must get a valid block, not min(512, lp)."""
    from rade_tpu.kernels.attention import _block_sizes

    for lp in range(128, 4096 + 1, 128):
        bs = _block_sizes(lp, 64)
        for b in (bs.block_q, bs.block_k_major, bs.block_k):
            assert lp % b == 0, (lp, b)
            assert b <= 512

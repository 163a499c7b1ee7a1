"""Fused (flash-style) biased self-attention for the WavLM eval path.

The unfused eval attention materializes three (B, H, L, L) tensors per
encoder layer (logits, logits+bias, probs) — ~5 GB of HBM round-trips per
WavLM-Large forward at bs=32.  This wraps JAX's Pallas TPU flash-attention
kernel (`jax.experimental.pallas.ops.tpu.flash_attention`), which keeps the
score tile in VMEM and streams the additive bias once, so only the bias
itself ever touches HBM.

Used at scoring/eval time only: the kernel has no probability-dropout
support, and the reference recipe applies attention dropout during training
(HF `WavLMModel` semantics, `/root/reference/src/models/DualStreamSEMamba.py:
276-439`), so the training path keeps the unfused einsum to stay
recipe-exact.  Eval is dropout-free, making the fused path bit-compatible up
to flash-attention's float reassociation.

WavLM's sequence length (202 frames for the 64600-sample crop) is not a
lane-tile multiple, so q/k/v are zero-padded to a 128 multiple and the
padded keys are masked with a large negative bias; padded query rows are
sliced away on return.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e9  # large finite negative: safe in bf16/f32 softmax


def reference_bias_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, bias: Optional[jax.Array]
) -> jax.Array:
    """Unfused reference: q pre-scaled, shapes (B, H, L, hd); bias (B|1, H, L, L)."""
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
    if bias is not None:
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@functools.lru_cache(maxsize=None)
def _block_sizes(lp: int, hd: int):
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    # the kernel requires block | sequence; lp is always a multiple of 128,
    # so pick the largest 128-multiple divisor of lp that is <= 512
    b = next(c for c in (512, 384, 256, 128) if lp % c == 0)
    b = min(b, lp)
    return BlockSizes(
        block_q=b, block_k_major=b, block_k=b, block_b=1,
        # backward blocks are required by the dataclass but unused on the
        # eval-only path
        block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b,
        block_q_dkv=b, block_k_major_dq=b, block_k_dq=b, block_q_dq=b,
    )


def fused_bias_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, bias: Optional[jax.Array]
) -> jax.Array:
    """Flash attention with an additive bias; falls back to the reference
    einsum off-TPU (CPU tests / virtual meshes) where the Mosaic kernel
    cannot run.

    Args:
      q: (B, H, L, hd), already scaled by hd**-0.5.
      k, v: (B, H, L, hd).
      bias: (B or 1, H, L, L) additive attention bias, or None (plain MHA).
    Returns:
      (B, H, L, hd) attention output.
    """
    if jax.default_backend() != "tpu":
        return reference_bias_attention(q, k, v, bias)

    from jax.experimental.pallas.ops.tpu.flash_attention import flash_attention

    B, H, L, hd = q.shape
    lp = -(-L // 128) * 128  # pad sequence to a lane-tile multiple
    pad = lp - L
    if pad:
        zpad = [(0, 0), (0, 0), (0, pad), (0, 0)]
        q, k, v = (jnp.pad(t, zpad) for t in (q, k, v))
    segment_ids = None
    if bias is None:
        # plain MHA (XLS-R-style models): never materialize an O(L^2) bias
        # of zeros — mask the padded keys with segment ids instead (padded
        # positions get segment 1, live positions 0)
        bias_p = None
        if pad:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                SegmentIds,
            )

            seg = (jnp.arange(lp) >= L).astype(jnp.int32)[None, :]
            seg = jnp.broadcast_to(seg, (B, lp))
            segment_ids = SegmentIds(q=seg, kv=seg)
    else:
        bias_p = jnp.broadcast_to(bias, (B, H, L, L))
        if pad:
            bias_p = jnp.pad(
                bias_p, [(0, 0), (0, 0), (0, pad), (0, pad)],
                constant_values=_NEG_INF,
            )
        bias_p = bias_p.astype(q.dtype)
    out = flash_attention(
        q, k, v, ab=bias_p, segment_ids=segment_ids, sm_scale=1.0,
        block_sizes=_block_sizes(lp, hd),
    )
    return out[:, :, :L, :] if pad else out

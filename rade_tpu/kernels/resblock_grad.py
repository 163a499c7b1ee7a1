"""Differentiable packed res-block chain: Pallas forward, XLA-recompute VJP.

In the Phase-6 training recipe the sinc stream's residual blocks run the
SAME function as at eval time (freeze_bn pins BatchNorm to running stats and
the blocks have no dropout — reference `src/config/Phase6_Proposed.conf`,
`models/AASIST.py:413-466`), so the fused packed-lane kernel
(`resblock_packed.py`, ~2x XLA on the forward) is usable in training too —
it only lacks a backward.  This wraps it in a `jax.custom_vjp`:

- forward: `resblock_chain_packed` (one HBM read of the packed activations
  per block);
- backward: recompute the chain with the jnp reference blocks
  (`resblock.resblock_ref`, f32 compute) and pull cotangents through with
  `jax.vjp` — i.e. rematerialization, but the stored residual is just the
  block INPUT (B, H, W, C), exactly what `sinc_remat` keeps today.

The backward is the exact linearization of the f32 reference chain; the
Pallas forward differs from it only by bf16 rounding/reassociation (cos
0.9976 across the 6-block flagship chain, `benchmarks/check_resblock_parity
.py`) — the same class of mismatch `jax.checkpoint` introduces between a
bf16 forward and its recompute.  Gradient-vs-reference test:
tests/test_resblock_grad.py (interpreter mode).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from .resblock import resblock_ref
from .resblock_packed import resblock_chain_packed


def chain_ref(blocks: Sequence[dict], e: jax.Array, eps: float = 1e-5) -> jax.Array:
    """jnp reference chain (differentiable) over the same params layout."""
    for bp in blocks:
        e = resblock_ref(
            e, bp["w1"], bp["b1"], bp["bn_scale"], bp["bn_bias"],
            bp["bn_mean"], bp["bn_var"], bp["w2"], bp["b2"],
            wd=bp.get("wd"), bd=bp.get("bd"), eps=eps,
        )
    return e


def _block_ref_nocast(x, bp, eps: float):
    """One block in the INPUT dtype (bf16 under mixed precision) — the
    linearization the flax module path would produce.  Only the per-channel
    BN fold runs in f32 (vectors, not tensors): keeping the (B, H, ~21k, C)
    intermediates in bf16 is what lets the recompute backward fit in HBM
    (the f32 `resblock_ref` chain OOM'd at the flagship training shapes)."""
    dt = x.dtype
    dn = jax.lax.conv_dimension_numbers(
        x.shape, bp["w1"].shape, ("NHWC", "HWIO", "NHWC")
    )
    z = jax.lax.conv_general_dilated(
        x, bp["w1"].astype(dt), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=dn,
    )
    inv = jax.lax.rsqrt(bp["bn_var"].astype(jnp.float32) + eps)
    scale = (bp["bn_scale"].astype(jnp.float32) * inv).astype(dt)
    shift = (
        bp["bn_bias"].astype(jnp.float32)
        + (bp["b1"].astype(jnp.float32) - bp["bn_mean"].astype(jnp.float32))
        * bp["bn_scale"].astype(jnp.float32) * inv
    ).astype(dt)
    z = jax.nn.selu(z * scale + shift)
    dn2 = jax.lax.conv_dimension_numbers(
        z.shape, bp["w2"].shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        z, bp["w2"].astype(dt), (1, 1), ((0, 0), (1, 1)),
        dimension_numbers=dn2,
    ) + bp["b2"].astype(dt)
    if "wd" in bp:
        dnd = jax.lax.conv_dimension_numbers(
            x.shape, bp["wd"].shape, ("NHWC", "HWIO", "NHWC")
        )
        idn = jax.lax.conv_general_dilated(
            x, bp["wd"].astype(dt), (1, 1), ((0, 0), (1, 1)),
            dimension_numbers=dnd,
        ) + bp["bd"].astype(dt)
    else:
        idn = x
    y = y + idn
    B, H, W, C = y.shape
    Wv = (W // 3) * 3
    return y[:, :, :Wv, :].reshape(B, H, W // 3, 3, C).max(axis=3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def chain_packed_trainable(blocks, e, eps: float = 1e-5):
    """Packed Pallas chain with an XLA-recompute backward.

    blocks: list of per-block param dicts (see `resblock_chain_packed`);
    e: (B, H, W, C) chain input.  Differentiable in both.
    """
    return resblock_chain_packed(e, list(blocks), eps=eps)


def _fwd(blocks, e, eps):
    return chain_packed_trainable(blocks, e, eps), (blocks, e)


def _bwd(eps, residuals, g):
    blocks, e = residuals
    # per-block jax.checkpoint: the recompute stores only each block's INPUT
    # (16 MB..0.4 GB, shrinking 3x per block) and replays one block's
    # intermediates at a time during the pullback
    block = jax.checkpoint(lambda bp, x: _block_ref_nocast(x, bp, eps))

    def chain(blocks, x):
        for bp in blocks:
            x = block(bp, x)
        return x

    _, vjp = jax.vjp(chain, blocks, e)
    db, dx = vjp(g)
    return db, dx


chain_packed_trainable.defvjp(_fwd, _bwd)

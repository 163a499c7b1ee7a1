"""Fused gated-bias attention with in-kernel dropout (training + eval).

WavLM's attention bias factorizes: ``gated_bias = gate(B,H,L,1) *
table(H,L,L)`` (`/root/reference/src/models/DualStreamSEMamba.py:276-439` ->
HF WavLMModel semantics).  The unfused training path materializes FOUR
per-sample O(L^2) tensors per encoder layer in HBM (gated bias, logits,
probs, dropped probs — ~84 MB/layer at bs=16, L=202) and the step is
HBM-bandwidth-bound (docs/BENCH_NOTES.md round-4 MFU section), so removing
that traffic is worth real step time.  The stock flash kernel
(kernels/attention.py) cannot help the train path: it has no
probability-dropout support and it *streams a materialized* (B,H,L,L) bias.

This kernel exploits the WavLM operating point instead of flash machinery:
at L=202 (padded to 256 lanes) one (b, h) slice's ENTIRE attention matrix is
a (256, 256) f32 tile — it fits in VMEM ~60x over.  So each grid step
computes a full dense attention row-block in one pass:

    s   = q @ k^T + gate * table + pad_mask      (MXU + VPU, f32)
    p   = softmax(s)                              (VPU, full rows in VMEM)
    pd  = dropout(p)   [train: TPU hardware PRNG, pltpu.prng_random_bits]
    out = pd @ v                                  (MXU)

and NOTHING of O(L^2) ever touches HBM — only q/k/v/out (L x 64) and the
per-head bias table (H,L,L, batch-independent, ~1.3 MB bf16 total).

The backward recomputes s and p from the same inputs (and the SAME dropout
mask: the PRNG is reseeded identically per (b,h) step) and emits every
cotangent in one kernel — dq, dk, dv, dgate (a row-sum), and the
batch-reduced dtable, accumulated across the batch grid dimension in VMEM
(grid is (H, B) with b innermost, so all revisits of a given table-head
block are consecutive).

Dropout semantics: Bernoulli(p) keep-mask scaled by 1/(1-p), drawn from the
TPU's hardware PRNG seeded per (layer-call seed, b, h).  This matches the
reference recipe in distribution (not bit-pattern) — the same substitution
class as `training_config.fast_rng` (threefry -> rbg), documented there.

Testing: `pltpu.prng_*` has no CPU lowering, so the CPU suite
(tests/test_gated_attention.py) injects an explicit keep-mask through the
same kernel bodies (``keep_mask=`` argument) and checks fwd + all five
cotangents against the unfused reference; the PRNG path (mask determinism,
keep-rate, fwd/bwd mask identity) is verified on real TPU by
benchmarks/check_gated_attention.py.

Used by nn/wavlm.py behind ``WavLMConfig.fused_gated_attention``; A/B and
ship decision recorded in docs/BENCH_NOTES.md.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e9

# tests flip this to run the Mosaic kernels in interpret mode on CPU
INTERPRET = False


def _pad_len(L: int) -> int:
    return -(-L // 128) * 128


def _smem_seed_spec():
    return pl.BlockSpec((1, 1), lambda *_: (0, 0), memory_space=pltpu.SMEM)


def _dropout_thresh(dropout_p: float) -> np.uint32:
    return np.uint32(min(2**32 - 1, int(dropout_p * 4294967296.0)))


def _softmax_rows(s: jax.Array, L: int) -> jax.Array:
    """Row softmax with padded key columns masked out (f32)."""
    Lp = s.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 1)
    s = jnp.where(col < L, s, _NEG_INF)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    return e / jnp.sum(e, axis=-1, keepdims=True)


# --------------------------------------------------------------------- fwd


def _fwd_body(q_ref, k_ref, v_ref, gate_ref, bias_ref, o_ref, keep, scale,
              *, L: int):
    # dots run on the NATIVE operand dtype (bf16 in production) with f32
    # accumulation — an f32 cast before the dot would run the MXU at its
    # ~4x-slower f32 rate for zero accuracy gain over the bf16 XLA baseline
    q = q_ref[0, 0]                              # (Lp, hd)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                            # (Lp, Lp) = q @ k^T
    gate = gate_ref[0, 0].astype(jnp.float32)    # (Lp, 1)
    bias = bias_ref[0].astype(jnp.float32)       # (Lp, Lp)
    p = _softmax_rows(s + gate * bias, L)
    if keep is not None:
        p = jnp.where(keep, p * scale, 0.0)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _fwd_kernel_prng(seed_ref, q_ref, k_ref, v_ref, gate_ref, bias_ref,
                     o_ref, *, L: int, dropout_p: float, n_heads: int):
    # grid (H, B), b innermost — same (seed + b*H + h) stream as before
    h = pl.program_id(0)
    b = pl.program_id(1)
    keep = scale = None
    if dropout_p > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + b * n_heads + h)
        bits = pltpu.prng_random_bits(
            (q_ref.shape[2], q_ref.shape[2])
        )
        keep = pltpu.bitcast(bits, jnp.uint32) >= _dropout_thresh(dropout_p)
        scale = 1.0 / (1.0 - dropout_p)
    _fwd_body(q_ref, k_ref, v_ref, gate_ref, bias_ref, o_ref, keep, scale,
              L=L)


def _fwd_kernel_mask(q_ref, k_ref, v_ref, gate_ref, bias_ref, m_ref, o_ref,
                     *, L: int, dropout_p: float):
    keep = m_ref[0, 0] != 0
    scale = 1.0 / (1.0 - dropout_p) if dropout_p > 0.0 else 1.0
    _fwd_body(q_ref, k_ref, v_ref, gate_ref, bias_ref, o_ref, keep, scale,
              L=L)


def _fwd_call(q, k, v, gate, bias, seed, keep_mask, *, L: int,
              dropout_p: float):
    B, H, Lp, hd = q.shape
    # grid (H, B), b innermost: the (h)-indexed bias block stays resident in
    # VMEM across all B revisits instead of being refetched every step
    qspec = pl.BlockSpec((1, 1, Lp, hd), lambda h, b: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((1, 1, Lp, 1), lambda h, b: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, Lp, Lp), lambda h, b: (h, 0, 0),
                         memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, 1, Lp, hd), lambda h, b: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    if keep_mask is None:
        kern = functools.partial(
            _fwd_kernel_prng, L=L, dropout_p=dropout_p, n_heads=H
        )
        return pl.pallas_call(
            kern,
            grid=(H, B),
            in_specs=[_smem_seed_spec(), qspec, qspec, qspec, gspec, bspec],
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((B, H, Lp, hd), q.dtype),
            interpret=INTERPRET,
        )(seed, q, k, v, gate, bias)
    kern = functools.partial(_fwd_kernel_mask, L=L, dropout_p=dropout_p)
    mspec = pl.BlockSpec((1, 1, Lp, Lp), lambda h, b: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(H, B),
        in_specs=[qspec, qspec, qspec, gspec, bspec, mspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, H, Lp, hd), q.dtype),
        interpret=INTERPRET,
    )(q, k, v, gate, bias, keep_mask)


# --------------------------------------------------------------------- bwd


def _bwd_body(b, q_ref, k_ref, v_ref, gate_ref, bias_ref, do_ref,
              dq_ref, dk_ref, dv_ref, dgate_ref, dbias_ref, keep, scale,
              *, L: int):
    q = q_ref[0, 0]                              # native dtype (bf16 prod)
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    do = do_ref[0, 0]                            # (Lp, hd)
    gate = gate_ref[0, 0].astype(jnp.float32)    # (Lp, 1)
    bias = bias_ref[0].astype(jnp.float32)       # (Lp, Lp)

    # ---- recompute the forward's p (identical math, identical mask) ----
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    p = _softmax_rows(s + gate * bias, L)        # (Lp, Lp)
    Lp = p.shape[-1]
    if keep is not None:
        pd = jnp.where(keep, p * scale, 0.0)
    else:
        pd = p

    # ---- cotangents ----
    # dpd = do @ v^T
    dpd = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                            # (Lq, Lk)
    if keep is not None:
        dp = jnp.where(keep, dpd * scale, 0.0)
    else:
        dp = dpd
    # softmax VJP: ds = p * (dp - rowsum(dp * p))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    # padded key cols already have p = 0 -> ds = 0 there; padded QUERY rows
    # hold garbage probs (uniform softmax of a masked row) — zero their
    # contributions explicitly (their do rows are zero anyway: the output
    # slice's VJP pads with zeros — belt and braces)
    row = jax.lax.broadcasted_iota(jnp.int32, (Lp, Lp), 0)
    ds = jnp.where(row < L, ds, 0.0)
    dpad = jnp.where(row < L, pd, 0.0)
    # MXU dots on the native dtype (bf16 prod, f32 on the CPU test path) —
    # same precision class as the bf16 XLA baseline's backward
    dsl = ds.astype(q.dtype)
    # dv = pd^T @ do
    dv = jax.lax.dot_general(
        dpad.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                            # (Lk, hd)
    dq = jax.lax.dot_general(
        dsl, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                            # (Lq, hd)
    dk = jax.lax.dot_general(
        dsl, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                            # (Lk, hd)
    dgate = jnp.sum(ds * bias, axis=-1, keepdims=True)  # (Lq, 1)

    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)
    dgate_ref[0, 0] = dgate.astype(dgate_ref.dtype)

    dbias_tile = (ds * gate).astype(jnp.float32)

    @pl.when(b == 0)
    def _():
        dbias_ref[0] = dbias_tile

    @pl.when(b > 0)
    def _():
        dbias_ref[0] = dbias_ref[0] + dbias_tile


def _bwd_kernel_prng(seed_ref, q_ref, k_ref, v_ref, gate_ref, bias_ref,
                     do_ref, dq_ref, dk_ref, dv_ref, dgate_ref, dbias_ref,
                     *, L: int, dropout_p: float, n_heads: int):
    h = pl.program_id(0)
    b = pl.program_id(1)
    keep = scale = None
    if dropout_p > 0.0:
        pltpu.prng_seed(seed_ref[0, 0] + b * n_heads + h)
        bits = pltpu.prng_random_bits(
            (q_ref.shape[2], q_ref.shape[2])
        )
        keep = pltpu.bitcast(bits, jnp.uint32) >= _dropout_thresh(dropout_p)
        scale = 1.0 / (1.0 - dropout_p)
    _bwd_body(b, q_ref, k_ref, v_ref, gate_ref, bias_ref, do_ref,
              dq_ref, dk_ref, dv_ref, dgate_ref, dbias_ref, keep, scale,
              L=L)


def _bwd_kernel_mask(q_ref, k_ref, v_ref, gate_ref, bias_ref, m_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, dgate_ref, dbias_ref,
                     *, L: int, dropout_p: float):
    b = pl.program_id(1)
    keep = m_ref[0, 0] != 0
    scale = 1.0 / (1.0 - dropout_p) if dropout_p > 0.0 else 1.0
    _bwd_body(b, q_ref, k_ref, v_ref, gate_ref, bias_ref, do_ref,
              dq_ref, dk_ref, dv_ref, dgate_ref, dbias_ref, keep, scale,
              L=L)


def _bwd_call(q, k, v, gate, bias, seed, keep_mask, do, *, L: int,
              dropout_p: float):
    B, H, Lp, hd = q.shape
    # grid (H, B): b innermost so every revisit of dbias block h is
    # consecutive and the in-VMEM accumulation is well-defined
    qspec = pl.BlockSpec((1, 1, Lp, hd), lambda h, b: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((1, 1, Lp, 1), lambda h, b: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, Lp, Lp), lambda h, b: (h, 0, 0),
                         memory_space=pltpu.VMEM)
    out_specs = [qspec, qspec, qspec, gspec, bspec]
    out_shape = [
        jax.ShapeDtypeStruct((B, H, Lp, hd), q.dtype),
        jax.ShapeDtypeStruct((B, H, Lp, hd), k.dtype),
        jax.ShapeDtypeStruct((B, H, Lp, hd), v.dtype),
        jax.ShapeDtypeStruct((B, H, Lp, 1), gate.dtype),
        jax.ShapeDtypeStruct((H, Lp, Lp), jnp.float32),
    ]
    if keep_mask is None:
        kern = functools.partial(
            _bwd_kernel_prng, L=L, dropout_p=dropout_p, n_heads=H
        )
        return pl.pallas_call(
            kern,
            grid=(H, B),
            in_specs=[_smem_seed_spec(), qspec, qspec, qspec, gspec, bspec,
                      qspec],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=INTERPRET,
        )(seed, q, k, v, gate, bias, do)
    kern = functools.partial(_bwd_kernel_mask, L=L, dropout_p=dropout_p)
    mspec = pl.BlockSpec((1, 1, Lp, Lp), lambda h, b: (b, h, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(H, B),
        in_specs=[qspec, qspec, qspec, gspec, bspec, mspec, qspec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=INTERPRET,
    )(q, k, v, gate, bias, keep_mask, do)


# ----------------------------------------------------------- custom VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _gated_attention_padded(q, k, v, gate, bias, seed, keep_mask, L,
                            dropout_p):
    return _fwd_call(q, k, v, gate, bias, seed, keep_mask, L=L,
                     dropout_p=dropout_p)


def _ga_fwd(q, k, v, gate, bias, seed, keep_mask, L, dropout_p):
    out = _fwd_call(q, k, v, gate, bias, seed, keep_mask, L=L,
                    dropout_p=dropout_p)
    return out, (q, k, v, gate, bias, seed, keep_mask)


def _ga_bwd(L, dropout_p, res, g):
    q, k, v, gate, bias, seed, keep_mask = res
    dq, dk, dv, dgate, dbias = _bwd_call(
        q, k, v, gate, bias, seed, keep_mask, g, L=L, dropout_p=dropout_p
    )
    return dq, dk, dv, dgate, dbias.astype(bias.dtype), None, None


_gated_attention_padded.defvjp(_ga_fwd, _ga_bwd)


# ----------------------------------------------------------- public API


def reference_gated_attention(q, k, v, gate, bias, key=None,
                              dropout_p: float = 0.0,
                              keep_mask: Optional[jax.Array] = None):
    """Unfused reference (tests / non-TPU fallback): q pre-scaled.

    ``keep_mask`` (B,H,L,L boolean) overrides the dropout draw so tests can
    compare against the kernel's in-kernel mask.
    """
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) + gate * bias[None]
    p = jax.nn.softmax(logits, axis=-1)
    if keep_mask is not None:
        p = jnp.where(keep_mask, p / (1.0 - dropout_p), 0.0)
    elif dropout_p > 0.0 and key is not None:
        keep = jax.random.bernoulli(key, 1.0 - dropout_p, p.shape)
        p = jnp.where(keep, p / (1.0 - dropout_p), 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def gated_attention(q, k, v, gate, bias, seed, dropout_p: float = 0.0,
                    train: bool = False,
                    keep_mask: Optional[jax.Array] = None) -> jax.Array:
    """Fused WavLM gated-bias attention; never materializes (B,H,L,L) in HBM.

    Args:
      q: (B, H, L, hd), already scaled by hd**-0.5.
      k, v: (B, H, L, hd).
      gate: (B, H, L, 1) positive per-query gate.
      bias: (H, L, L) relative-position bias table (batch-independent).
      seed: int32/uint32 scalar; per-layer dropout stream seed (ignored when
        not training or dropout_p == 0).
      dropout_p: attention-probability dropout rate (train only).
      train: apply dropout when True.
      keep_mask: optional explicit (B,H,L,L) boolean keep-mask — testing
        path (defeats the kernel's whole point in production: it is a
        materialized per-sample O(L^2) tensor).

    Returns: (B, H, L, hd).
    """
    B, H, L, hd = q.shape
    p_eff = float(dropout_p) if train else 0.0
    Lp = _pad_len(L)
    pad = Lp - L
    if pad:
        zp = [(0, 0), (0, 0), (0, pad), (0, 0)]
        q, k, v = (jnp.pad(t, zp) for t in (q, k, v))
        gate = jnp.pad(gate, zp)
        bias = jnp.pad(bias, [(0, 0), (0, pad), (0, pad)])
        if keep_mask is not None:
            keep_mask = jnp.pad(
                keep_mask, [(0, 0), (0, 0), (0, pad), (0, pad)]
            )
    if keep_mask is not None:
        keep_mask = keep_mask.astype(jnp.int8)
    seed = jnp.asarray(seed).astype(jnp.int32).reshape((1, 1))
    out = _gated_attention_padded(
        q, k, v, gate, bias, seed, keep_mask, L, p_eff
    )
    return out[:, :, :L, :] if pad else out


def dump_keep_mask(B: int, H: int, L: int, seed, dropout_p: float,
                   interpret: bool = False) -> jax.Array:
    """The exact keep-mask the PRNG kernels draw for (seed, b, h) — TPU-only
    test hook (pltpu.prng has no CPU lowering).

    Reproduces the kernels' seeding discipline so the reference path can be
    fed the same mask for bitwise fwd/bwd comparisons
    (benchmarks/check_gated_attention.py).
    """
    Lp = _pad_len(L)
    thresh = _dropout_thresh(dropout_p)

    def kern(seed_ref, o_ref):
        b = pl.program_id(0)
        h = pl.program_id(1)
        pltpu.prng_seed(seed_ref[0, 0] + b * H + h)
        bits = pltpu.prng_random_bits((Lp, Lp))
        o_ref[0, 0] = (
            pltpu.bitcast(bits, jnp.uint32) >= thresh
        ).astype(jnp.int8)

    seed = jnp.asarray(seed).astype(jnp.int32).reshape((1, 1))
    m = pl.pallas_call(
        kern,
        grid=(B, H),
        in_specs=[_smem_seed_spec()],
        out_specs=pl.BlockSpec((1, 1, Lp, Lp), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Lp, Lp), jnp.int8),
        interpret=interpret or INTERPRET,
    )(seed)
    return m[:, :, :L, :L].astype(bool)

"""Fused Pallas TPU kernel for the AASIST/SincNet 2-D residual block.

One block (reference `models/AASIST.py:413-466`, eval mode) is

    z   = selu(BN(conv1_{2x3, padH(1,1), padW(1,1)}(x)))
    y   = conv2_{2x3, padH(0,0), padW(1,1)}(z) + (x | conv_ds_{1x3}(x))
    out = maxpool_{1x3, stride 3}(y)

XLA lowers this to 6+ full HBM passes over the (B, H, W~21490, C) activation
(profiled at ~50% of flagship inference time); this kernel runs the whole
block in VMEM per (batch, W-tile) grid step, so HBM traffic is one read of x
and one write of the 3x-smaller pooled output.

STATUS: EXPERIMENTAL, not wired into any model.  Numerically verified on
real v5e (bf16 maxerr 6e-2 vs the XLA path) but slower than XLA as written:
the (B, n_tiles) grid with per-row 2-D dots issues ~350 small MXU ops per
step across ~3.6k steps and is latency-bound (measured 5.4 s vs XLA's 20 ms
for block 0 at bs=32).  A production version needs an all-batch coarse grid
with W-minor layouts so each step is a few large matmuls; see
docs/BENCH_NOTES.md "negative results".

Tiling.  Grid (B, n_tiles+1), W chunked into WT-column tiles (WT % 24 == 0:
sublane-aligned and pool-aligned).  The W halo (conv1 + conv2 need x columns
w-2..w+2) is handled with a ONE-TILE LAG instead of overlapping reads: a VMEM
scratch window `xw` of shape (H, WT+4, Cin) holds [last 2 cols of tile t-2 |
tile t-1 | first 2 cols of tile t]; grid step t computes pooled output tile
t-1 from it, then shifts the window.  Out-block index map `max(t-1, 0)`
makes step 0 write a throwaway block that step 1 overwrites (consecutive
revisits of the same block are legal).

Eval-only: BatchNorm is folded to an affine (scale, shift) from running
stats, and the wrapper is not differentiable (training uses the XLA path).

Shapes: x (B, H, W, Cin) -> out (B, H, W // 3, Cout); compute fp32, storage
dtype preserved.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _row_conv(xp, w_ref, n_rows: int, n_cols: int, kh: int, kw: int):
    """Sum of shifted 2-D dots: rows of a (kh x kw) conv as MXU matmuls.

    xp: (n_rows + kh - 1, >= n_cols + kw - 1, Cin) fp32 value;
    w_ref: (kh * kw, Cin, Cout) VMEM ref.  Returns (n_rows, n_cols, Cout).
    """
    rows = []
    for r in range(n_rows):
        acc = None
        for dh in range(kh):
            for dw in range(kw):
                w = w_ref[dh * kw + dw].astype(jnp.float32)
                part = jax.lax.dot(
                    xp[r + dh, dw : dw + n_cols, :], w,
                    preferred_element_type=jnp.float32,
                )
                acc = part if acc is None else acc + part
        rows.append(acc)
    return jnp.stack(rows, axis=0)


def _resblock_kernel(
    x_ref, w1_ref, aff_ref, w2_ref, b2_ref, wd_ref, out_ref, xw,
    *, H: int, WT: int, use_ds: bool, n_tiles: int, w_true: int,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        xw[:] = jnp.zeros_like(xw)

    x_cur = x_ref[0]  # (H, WT, Cin)
    # right context of tile t-1 = first 2 cols of tile t (zeros past the end)
    fill = jnp.where(t < n_tiles, x_cur[:, 0:2, :], jnp.zeros_like(x_cur[:, 0:2, :]))
    xw[:, WT + 2 : WT + 4, :] = fill.astype(xw.dtype)

    xfull = xw[:, :, :].astype(jnp.float32)  # (H, WT+4, Cin)

    # conv1: pad H by (1,1) -> H+1 out rows; z col j (= window col j+1)
    # uses x window cols j..j+2, so xp enters _row_conv unshifted
    zrow = jnp.zeros_like(xfull[0:1])
    xp = jnp.concatenate([zrow, xfull, zrow], axis=0)  # (H+2, WT+4, Cin)
    z = _row_conv(xp, w1_ref, H + 1, WT + 2, 2, 3)

    # folded BN (+conv1 bias) affine, then SELU (spelled out with exp —
    # Mosaic has no expm1 lowering)
    scale = aff_ref[0].astype(jnp.float32)  # (1, Cout)
    shift = aff_ref[1].astype(jnp.float32)
    z = z * scale[None] + shift[None]
    selu_l, selu_a = 1.0507009873554805, 1.6732632423543772
    z = selu_l * jnp.where(z > 0, z, selu_a * (jnp.exp(jnp.minimum(z, 0.0)) - 1.0))

    # conv2 zero-pads z at the TRUE W boundaries; z columns the reference
    # never evaluates (true col < 0 or >= W) must be exactly 0, not
    # selu(shift): mask by the true column index of each z column
    j = jax.lax.broadcasted_iota(jnp.int32, (1, WT + 2, 1), 1)
    true_col = (t - 1) * WT - 1 + j
    z = jnp.where((true_col >= 0) & (true_col < w_true), z, 0.0)

    # conv2: no H pad (H+1 -> H rows); out col w uses z cols w..w+2
    y = _row_conv(z, w2_ref, H, WT, 2, 3)
    y = y + b2_ref[:].astype(jnp.float32)[None]  # (1, 1, Cout)

    if use_ds:
        # shortcut conv 1x3: out col w (window col w+2) uses x cols w+1..w+3
        idn = _row_conv(xfull[:, 1:, :], wd_ref, H, WT, 1, 3)
    else:
        idn = xfull[:, 2 : WT + 2, :]
    y = y + idn

    # maxpool (1,3) stride 3.  Mosaic has no strided slicing, so: running
    # max of two circular rolls gives m[:, w] = max(y[w..w+2]), then a 0/1
    # selection matmul picks columns 3k (wrap-around never lands on a
    # selected column since 3k+2 <= WT-1)
    m = jnp.maximum(y, pltpu.roll(y, shift=WT - 1, axis=1))
    m = jnp.maximum(m, pltpu.roll(y, shift=WT - 2, axis=1))
    PT = WT // 3
    kk = jax.lax.broadcasted_iota(jnp.int32, (PT, WT), 0)
    ww = jax.lax.broadcasted_iota(jnp.int32, (PT, WT), 1)
    sel = (ww == 3 * kk).astype(jnp.float32)  # (PT, WT)
    pooled = jnp.stack(
        [
            jax.lax.dot(sel, m[r], preferred_element_type=jnp.float32)
            for r in range(H)
        ],
        axis=0,
    )  # (H, PT, Cout)
    out_ref[0] = pooled.astype(out_ref.dtype)

    # shift the window: new left context = last 2 cols of tile t-1
    xw[:, 0:2, :] = xw[:, WT : WT + 2, :]
    xw[:, 2 : WT + 2, :] = x_cur.astype(xw.dtype)


def fused_resblock(
    x: jax.Array,
    w1: jax.Array, b1: jax.Array,
    bn_scale: jax.Array, bn_bias: jax.Array,
    bn_mean: jax.Array, bn_var: jax.Array,
    w2: jax.Array, b2: jax.Array,
    wd: Optional[jax.Array] = None, bd: Optional[jax.Array] = None,
    *, eps: float = 1e-5, wt: int = 192,
) -> jax.Array:
    """Eval-mode residual block.  Weights in flax layout: w1/w2 (2, 3, Cin|C,
    Cout), wd (1, 3, Cin, Cout) or None for the identity shortcut."""
    B, H, W, Cin = x.shape
    Cout = w1.shape[-1]

    # fold conv1 bias + BN into one affine on the conv output
    inv = 1.0 / jnp.sqrt(bn_var.astype(jnp.float32) + eps)
    scale = bn_scale.astype(jnp.float32) * inv
    shift = (
        bn_bias.astype(jnp.float32)
        + (b1.astype(jnp.float32) - bn_mean.astype(jnp.float32)) * scale
    )
    aff = jnp.stack([scale, shift], axis=0)[:, None, :]  # (2, 1, Cout)

    n_tiles = -(-W // wt)
    Wp = n_tiles * wt
    x_p = jnp.pad(x, ((0, 0), (0, 0), (0, Wp - W), (0, 0)))
    use_ds = wd is not None

    w1_k = w1.reshape(6, Cin, Cout)
    w2_k = w2.reshape(6, Cout, Cout)
    if use_ds:
        # fold bd into conv2's bias path?  bd applies to the shortcut only:
        # y = conv2 + b2 + conv_ds + bd  ->  merge both biases
        wd_k = wd.reshape(3, Cin, Cout)
        b2 = b2 + bd
    else:
        wd_k = jnp.zeros((3, Cin, Cout), w1.dtype)
    b2_k = b2[None, :]  # (1, Cout)

    grid = (B, n_tiles + 1)
    PT = wt // 3

    out = pl.pallas_call(
        functools.partial(
            _resblock_kernel, H=H, WT=wt, use_ds=use_ds, n_tiles=n_tiles,
            w_true=W,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, n_tiles * PT, Cout), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, H, wt, Cin),
                lambda b, t: (b, 0, jnp.minimum(t, n_tiles - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((6, Cin, Cout), lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, Cout), lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((6, Cout, Cout), lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Cout), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Cin, Cout), lambda b, t: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, PT, Cout), lambda b, t: (b, 0, jnp.maximum(t - 1, 0), 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((H, wt + 4, Cin), x.dtype)],
    )(x_p, w1_k, aff, w2_k, b2_k, wd_k)
    return out[:, :, : W // 3, :]


def resblock_ref(
    x, w1, b1, bn_scale, bn_bias, bn_mean, bn_var, w2, b2, wd=None, bd=None,
    *, eps: float = 1e-5,
):
    """jnp reference (mirrors flax ResBlock2D in eval mode) for testing."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w1.shape, ("NHWC", "HWIO", "NHWC"))
    z = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w1.astype(jnp.float32), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=dn,
    ) + b1.astype(jnp.float32)
    inv = 1.0 / jnp.sqrt(bn_var.astype(jnp.float32) + eps)
    z = (z - bn_mean.astype(jnp.float32)) * inv * bn_scale.astype(
        jnp.float32
    ) + bn_bias.astype(jnp.float32)
    z = jax.nn.selu(z)
    dn2 = jax.lax.conv_dimension_numbers(z.shape, w2.shape, ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        z, w2.astype(jnp.float32), (1, 1), ((0, 0), (1, 1)), dimension_numbers=dn2,
    ) + b2.astype(jnp.float32)
    if wd is not None:
        dnd = jax.lax.conv_dimension_numbers(x.shape, wd.shape, ("NHWC", "HWIO", "NHWC"))
        idn = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), wd.astype(jnp.float32), (1, 1),
            ((0, 0), (1, 1)), dimension_numbers=dnd,
        ) + bd.astype(jnp.float32)
    else:
        idn = x.astype(jnp.float32)
    y = y + idn
    B, H, W, C = y.shape
    Wv = (W // 3) * 3
    y = y[:, :, :Wv, :].reshape(B, H, W // 3, 3, C).max(axis=3)
    return y.astype(x.dtype)

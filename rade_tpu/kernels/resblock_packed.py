"""Fused Pallas TPU kernel for the AASIST/SincNet residual block, v2.

Replaces `kernels/resblock.py` (v1, kept as a documented negative result):
v1's per-(batch, W-tile) grid with ~350 tiny per-row dots was MXU-latency
bound (250x slower than XLA).  This version uses the redesign sketched in
v1's header and docs/BENCH_NOTES.md:

- **Lane-packed layout**: activations live as ``(B, W, L)`` where the lane
  dimension packs (spectral-row, channel) pairs, ``L = ceil(H*C/128)*128``.
  W (the ~21k-frame time axis) is the sublane dimension, so W-shifts are
  sublane rolls and H-shifts are lane rolls — no per-row code.
- **Block-diagonal tap matmuls**: a (2,3) conv becomes, per tap (dh, dw),
  one (128, 128) matmul per output lane tile.  The tap matrix scatters the
  (Cin, Cout) kernel tap onto the (row-in, row-out) lane blocks; H boundary
  conditions live in the matrix (zero rows), so lane-roll wraparound needs
  no masking.  128 % C == 0 is required (C in {1, 4, 8, 32, 64} all work).
- **All-batch coarse grid** ``(B, n_w_tiles + 1)`` with the v1 one-tile-lag
  W-halo: a VMEM window holds [2 cols of tile t-2 | tile t-1 | 2 cols of
  tile t]; step t computes tile t-1.  W-tiles are thousands of frames, so
  each grid step runs a few dozen (WT, 128) x (128, 128) matmuls.

One block (reference `models/AASIST.py:413-466`, eval mode) is

    z   = selu(BN(conv1_{2x3, padH(1,1), padW(1,1)}(x)))
    y   = conv2_{2x3, padH(0,0), padW(1,1)}(z) + (x | conv_ds_{1x3}(x))
    out = maxpool_{1x3, stride 3}(y)

HBM traffic is one read of x_packed and one write of the 3x-smaller pooled
output (weights/taps are VMEM-resident).  Eval-only: BN folds to an affine
from running stats; training uses the XLA path.  Compute: bf16 operands,
f32 accumulation; storage dtype preserved.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def pack_hwc(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, W, L) with lanes = (row, channel), zero-padded."""
    B, H, W, C = x.shape
    L = _ceil_to(H * C, LANE)
    p = x.transpose(0, 2, 1, 3).reshape(B, W, H * C)
    return jnp.pad(p, ((0, 0), (0, 0), (0, L - H * C)))


def unpack_hwc(p: jax.Array, H: int, C: int) -> jax.Array:
    """(B, W, L) -> (B, H, W, C)."""
    B, W, _ = p.shape
    return p[:, :, : H * C].reshape(B, W, H, C).transpose(0, 2, 1, 3)


def _tap_structure(H_src: int, C_src: int, H_dst: int, C_dst: int,
                   delta: int, L_src: int, L_dst: int):
    """Static (src_tile per dst_tile) map for one tap after the lane roll.

    In rolled coordinates, tap matrix A[r*C_src + ci, r*C_dst + co] =
    w[ci, co] for dst rows r with a valid src row r+delta.  Each dst lane
    tile draws from exactly one src lane tile (requires the per-dst-tile
    src span R_dst*C_src to divide 128, true for all C here).
    """
    n_dst = L_dst // LANE
    r_per_dst = LANE // C_dst
    src_tiles = []
    for j in range(n_dst):
        r0 = j * r_per_dst
        src_tiles.append((r0 * C_src) // LANE if r0 < H_dst else 0)
    return src_tiles


def _tap_matrix(w_tap: jax.Array, H_src: int, H_dst: int, delta: int,
                L_src: int, L_dst: int) -> jax.Array:
    """Dense rolled tap matrix (L_src, L_dst); built with static scatters
    (w_tap is traced, the structure is not)."""
    C_src, C_dst = w_tap.shape
    A = jnp.zeros((L_src, L_dst), jnp.float32)
    w32 = w_tap.astype(jnp.float32)
    for r in range(H_dst):
        if 0 <= r + delta < H_src:
            A = A.at[r * C_src:(r + 1) * C_src, r * C_dst:(r + 1) * C_dst].set(w32)
    return A


def _conv_tap_blocks(w: jax.Array, H_src: int, H_dst: int, deltas: Sequence[int],
                     L_src: int, L_dst: int):
    """(n_taps, T_dst, 128, 128) tile stack + static src-tile map.

    w: (kh, 3, C_src, C_dst) flax conv kernel; taps ordered (dh major, dw
    minor); deltas[dh] = src-row offset of tap dh.
    """
    kh = w.shape[0]
    n_dst = L_dst // LANE
    blocks = []
    srcs = []
    for dh in range(kh):
        A = None
        src = _tap_structure(H_src, w.shape[2], H_dst, w.shape[3],
                             deltas[dh], L_src, L_dst)
        for dw in range(3):
            A = _tap_matrix(w[dh, dw], H_src, H_dst, deltas[dh], L_src, L_dst)
            tiles = jnp.stack(
                [
                    jax.lax.dynamic_slice(
                        A, (src[j] * LANE, j * LANE), (LANE, LANE)
                    )
                    for j in range(n_dst)
                ]
            )
            blocks.append(tiles)
        srcs.append(src)
    return jnp.stack(blocks), srcs  # (kh*3, T_dst, 128, 128), per-dh src map


def _lane_vec(v: jax.Array, H: int, L: int) -> jax.Array:
    """Broadcast a per-channel vector over H lane blocks -> (1, L)."""
    C = v.shape[0]
    out = jnp.tile(v.astype(jnp.float32), (H,))
    return jnp.pad(out, (0, L - H * C))[None, :]


def _selu(z):
    selu_l, selu_a = 1.0507009873554805, 1.6732632423543772
    return selu_l * jnp.where(
        z > 0, z, selu_a * (jnp.exp(jnp.minimum(z, 0.0)) - 1.0)
    )


def _resblock_packed_kernel(
    x_ref, c1_ref, aff_ref, c2_ref, b2_ref, ds_ref, out_ref, xw, zbuf,
    *, WT: int, use_ds: bool, n_tiles: int, w_true: int,
    Cin: int, Cout: int, c1_src, c2_src, ds_src, T_z: int, T_out: int,
):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        xw[:] = jnp.zeros_like(xw)

    x_cur = x_ref[0]  # (WT, L_in)
    fill = jnp.where(t < n_tiles, x_cur[0:2, :], jnp.zeros_like(x_cur[0:2, :]))
    xw[WT + 2: WT + 4, :] = fill.astype(xw.dtype)

    xf = xw[:]  # (WT+4, L_in), compute dtype (bf16 on TPU)

    def lane_roll(a, shift):
        # Mosaic lane rotate is 32-bit only: roll a f32 copy, cast back
        if a.dtype.itemsize == 4:
            return pltpu.roll(a, shift=shift, axis=1)
        return pltpu.roll(a.astype(jnp.float32), shift=shift, axis=1).astype(
            a.dtype
        )

    # conv1 H-taps: out row r uses in rows r-1 (dh=0) and r (dh=1);
    # the dh=0 roll brings row r-1 into lane block r
    xrolls = (lane_roll(xf, Cin), xf)

    # z col jz covers true col (t-1)*WT - 1 + jz; mask cols outside [0, W)
    jz = jax.lax.broadcasted_iota(jnp.int32, (WT + 2, 1), 0)
    true_col = (t - 1) * WT - 1 + jz
    zmask = (true_col >= 0) & (true_col < w_true)

    for j in range(T_z):
        acc = None
        for dh in range(2):
            xr = xrolls[dh]
            s = c1_src[dh][j] * LANE
            for dw in range(3):
                d = jax.lax.dot(
                    xr[dw: dw + WT + 2, s: s + LANE],
                    c1_ref[dh * 3 + dw, j],
                    preferred_element_type=jnp.float32,
                )
                acc = d if acc is None else acc + d
        scale = aff_ref[0, j * LANE: (j + 1) * LANE].astype(jnp.float32)
        shift = aff_ref[1, j * LANE: (j + 1) * LANE].astype(jnp.float32)
        zt = _selu(acc * scale[None, :] + shift[None, :])
        zbuf[:, j * LANE: (j + 1) * LANE] = jnp.where(zmask, zt, 0.0).astype(
            zbuf.dtype
        )

    zb = zbuf[:]
    # conv2 H-taps: out row r uses z rows r (dh=0) and r+1 (dh=1); the
    # negative lane shift is expressed as its positive circular equivalent
    zrolls = (zb, lane_roll(zb, zb.shape[-1] - Cout))

    # int32 iota: Mosaic has no f32 iota lowering
    kk = jax.lax.broadcasted_iota(jnp.int32, (WT // 3, WT), 0)
    ww = jax.lax.broadcasted_iota(jnp.int32, (WT // 3, WT), 1)
    sel = (ww == 3 * kk).astype(xf.dtype)  # picks cols 3k

    for j in range(T_out):
        acc = None
        for dh in range(2):
            zr = zrolls[dh]
            s = c2_src[dh][j] * LANE
            for dw in range(3):
                # y col jy = z cols jy+dw in window coords (z idx jz = jy+1)
                d = jax.lax.dot(
                    zr[dw: dw + WT, s: s + LANE],
                    c2_ref[dh * 3 + dw, j],
                    preferred_element_type=jnp.float32,
                )
                acc = d if acc is None else acc + d
        if use_ds:
            s = ds_src[0][j] * LANE
            for dw in range(3):
                d = jax.lax.dot(
                    xf[1 + dw: 1 + dw + WT, s: s + LANE],
                    ds_ref[dw, j],
                    preferred_element_type=jnp.float32,
                )
                acc = acc + d
        else:
            acc = acc + xf[2: 2 + WT, j * LANE: (j + 1) * LANE].astype(
                jnp.float32
            )
        y = acc + b2_ref[0, j * LANE: (j + 1) * LANE].astype(jnp.float32)[None, :]
        # maxpool(1,3) stride 3: running max of two circular rolls, then a
        # 0/1 selection matmul picks cols 3k (wrap never lands on a pick);
        # operands in the compute dtype (bf16 on TPU) to halve VMEM
        m = jnp.maximum(y, pltpu.roll(y, shift=WT - 1, axis=0))
        m = jnp.maximum(m, pltpu.roll(y, shift=WT - 2, axis=0))
        pooled = jax.lax.dot(
            sel, m.astype(xf.dtype), preferred_element_type=jnp.float32
        )
        out_ref[0, :, j * LANE: (j + 1) * LANE] = pooled.astype(out_ref.dtype)

    # slide the lag window
    xw[0:2, :] = xw[WT: WT + 2, :]
    xw[2: WT + 2, :] = x_cur.astype(xw.dtype)


def fused_resblock_packed(
    x_packed: jax.Array,
    H: int,
    w1: jax.Array, b1: jax.Array,
    bn_scale: jax.Array, bn_bias: jax.Array,
    bn_mean: jax.Array, bn_var: jax.Array,
    w2: jax.Array, b2: jax.Array,
    wd: Optional[jax.Array] = None, bd: Optional[jax.Array] = None,
    *, eps: float = 1e-5, wt: int = 1200, w_true: Optional[int] = None,
) -> jax.Array:
    """Eval-mode residual block on the packed (B, W, L_in) layout.

    Weights in flax layout: w1/w2 (2, 3, Cin|Cout, Cout), wd (1, 3, Cin,
    Cout) or None for the identity shortcut.  Returns (B, ceil(W/wt)*wt//3,
    L_out); valid output cols are [0, w_true // 3).
    """
    B, W, L_in = x_packed.shape
    Cin, Cout = w1.shape[2], w1.shape[3]
    if w_true is None:
        w_true = W
    assert LANE % Cin == 0 and LANE % Cout == 0, (Cin, Cout)
    assert wt % 24 == 0, wt
    H1 = H + 1  # conv1 pads H by (1,1) with a 2-row kernel
    L_z = _ceil_to(H1 * Cout, LANE)
    L_out = _ceil_to(H * Cout, LANE)
    assert L_in >= _ceil_to(H * Cin, LANE)

    # fold conv1 bias + BN into one affine on the conv1 output
    inv = 1.0 / jnp.sqrt(bn_var.astype(jnp.float32) + eps)
    scale = bn_scale.astype(jnp.float32) * inv
    shift = (
        bn_bias.astype(jnp.float32)
        + (b1.astype(jnp.float32) - bn_mean.astype(jnp.float32)) * scale
    )
    aff = jnp.concatenate(
        [_lane_vec(scale, H1, L_z), _lane_vec(shift, H1, L_z)], axis=0
    )

    c1_blocks, c1_src = _conv_tap_blocks(w1, H, H1, (-1, 0), L_in, L_z)
    c2_blocks, c2_src = _conv_tap_blocks(w2, H1, H, (0, 1), L_z, L_out)
    use_ds = wd is not None
    if use_ds:
        ds_blocks, ds_src = _conv_tap_blocks(wd, H, H, (0,), L_in, L_out)
        b2_eff = b2 + bd
    else:
        ds_blocks = jnp.zeros((3, L_out // LANE, LANE, LANE), jnp.float32)
        ds_src = [[0] * (L_out // LANE)]
        b2_eff = b2
    b2_l = _lane_vec(b2_eff, H, L_out)

    cdt = x_packed.dtype  # compute dtype for matmul operands
    c1_blocks = c1_blocks.astype(cdt)
    c2_blocks = c2_blocks.astype(cdt)
    ds_blocks = ds_blocks.astype(cdt)

    n_tiles = -(-W // wt)
    Wp = n_tiles * wt
    x_p = jnp.pad(x_packed, ((0, 0), (0, Wp - W), (0, 0)))
    PT = wt // 3
    T_z, T_out = L_z // LANE, L_out // LANE

    # freeze static src maps as tuples for the kernel closure
    c1_src = tuple(tuple(s) for s in c1_src)
    c2_src = tuple(tuple(s) for s in c2_src)
    ds_src = tuple(tuple(s) for s in ds_src)

    out = pl.pallas_call(
        functools.partial(
            _resblock_packed_kernel,
            WT=wt, use_ds=use_ds, n_tiles=n_tiles, w_true=w_true,
            Cin=Cin, Cout=Cout, c1_src=c1_src, c2_src=c2_src, ds_src=ds_src,
            T_z=T_z, T_out=T_out,
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_tiles * PT, L_out), x_packed.dtype),
        grid=(B, n_tiles + 1),
        in_specs=[
            pl.BlockSpec(
                (1, wt, L_in),
                lambda b, t: (b, jnp.minimum(t, n_tiles - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (6, T_z, LANE, LANE), lambda b, t: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((2, L_z), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (6, T_out, LANE, LANE), lambda b, t: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, L_out), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (3, T_out, LANE, LANE), lambda b, t: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, PT, L_out), lambda b, t: (b, jnp.maximum(t - 1, 0), 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((wt + 4, L_in), x_packed.dtype),
            pltpu.VMEM((wt + 2, L_z), cdt),
        ],
    )(x_p, c1_blocks, aff, c2_blocks, b2_l, ds_blocks)
    return out


def _pick_wt(w_true: int, Cin: int, Cout: int, H: int,
             budget_bytes: int = 13 * 1024 * 1024, itemsize: int = 2) -> int:
    """Largest 24-multiple W tile that fits the ~16MB scoped-VMEM limit.

    Rough model of the kernel's resident buffers: pipeline in/out blocks
    (double-buffered), lag window, z buffer, tap-tile weights, the pool
    selection matrix and f32 per-tile temporaries.
    """
    H1 = H + 1
    L_in = _ceil_to(H * Cin, LANE)
    L_z = _ceil_to(H1 * Cout, LANE)
    L_out = _ceil_to(H * Cout, LANE)
    w_tiles = (6 * (L_z // LANE) + 9 * (L_out // LANE)) * LANE * LANE * itemsize

    def usage(wt: int) -> int:
        return (
            2 * wt * L_in * itemsize            # input double buffer
            + (wt + 4) * L_in * itemsize        # lag window
            + (wt + 2) * L_z * itemsize         # z buffer
            + 2 * (wt // 3) * L_out * itemsize  # output double buffer
            + (wt // 3) * wt * itemsize         # pool selection matrix
            + 6 * wt * LANE * 4                 # f32 acc/y/m temporaries
            + w_tiles
        )

    for wt in (2400, 1800, 1200, 960, 720, 600, 480, 360, 240, 120, 72, 48, 24):
        if wt <= max(24, _ceil_to(w_true, 24)) and usage(wt) <= budget_bytes:
            return wt
    return 24


def resblock_chain_packed(
    x: jax.Array, blocks_params: Sequence[dict], *, eps: float = 1e-5,
    wt_table: Optional[Sequence[int]] = None,
) -> jax.Array:
    """Run a stack of residual blocks fully in the packed layout.

    x: (B, H, W, C) activation entering block 0 (after the sinc frontend's
    pool/BN/SELU).  blocks_params: per block a dict with keys
    w1,b1,bn_scale,bn_bias,bn_mean,bn_var,w2,b2[,wd,bd] (flax layouts).
    Returns (B, H, W_out, C_out) in the natural layout.
    """
    B, H, W, C = x.shape
    p = pack_hwc(x)
    w_true = W
    for i, bp in enumerate(blocks_params):
        if wt_table is not None and i < len(wt_table):
            wt = wt_table[i]
        else:
            wt = _pick_wt(
                w_true, bp["w1"].shape[2], bp["w1"].shape[3], H,
                itemsize=x.dtype.itemsize,
            )
        p = fused_resblock_packed(
            p[:, :w_true], H,
            bp["w1"], bp["b1"], bp["bn_scale"], bp["bn_bias"],
            bp["bn_mean"], bp["bn_var"], bp["w2"], bp["b2"],
            bp.get("wd"), bp.get("bd"), eps=eps, wt=wt, w_true=w_true,
        )
        w_true = w_true // 3
    cout = blocks_params[-1]["w1"].shape[3]
    return unpack_hwc(p[:, :w_true, :], H, cout)

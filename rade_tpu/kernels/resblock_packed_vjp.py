"""Native Pallas backward for the packed res-block chain.

Round-2 follow-up to `kernels/resblock_grad.py`: that module wraps the packed
forward (`resblock_packed.py`) in a `jax.custom_vjp` whose backward
REMATERIALIZES the chain with XLA convs — correct, but its replay buffers
(z and dy at (B, H, ~21k, C)) stack on top of the WavLM working set and OOM
the flagship training step by ~0.86 GB at micro-batch 16 (docs/BENCH_NOTES.md).
This module computes the whole block backward *inside* Pallas: nothing bigger
than the saved block inputs ever touches HBM, and the select-and-scatter /
reduce-window / conv-transpose chains XLA emits for the pool/conv backward
(the dominant ops in the recipe-exact training profile) disappear.

Reference semantics (one block, eval/freeze_bn mode — the Phase-6 training
recipe, `models/AASIST.py:413-466`, `src/config/Phase6_Proposed.conf`):

    pre = conv1_{2x3, padH(1,1), padW(1,1)}(x)            # no bias: folded
    z   = selu(pre * scale + shift)                       # BN folded affine
    y   = conv2_{2x3, padH(0,0), padW(1,1)}(z) + b2_eff + (x | conv_ds(x))
    out = maxpool_{1x3, stride 3}(y)

Backward, per W-tile (lag windows give the +-6 column halo):

    recompute pre, z, y                                   # same tap matmuls
    dy   = route(g): tie-split over the 3-group argmax    # == jnp reduce_max VJP
    dz   = conv2^T(dy)      da = dz * selu'(a)            # NT tap matmuls
    dx   = conv1^T(da*scale) + (ds^T(dy) | dy)            # streamed out
    dw   = activations^T @ cotangents                     # TN tap matmuls into
                                                          # (taps, P, 128, 128)
    d(scale, shift, b2) = lane-vector column sums

Weight-gradient accumulators exploit the block-diagonal tap structure: the
per-dst-tile (128, 128) products are summed over dst tiles that share the
same lane-alignment phase (P = tile period of the (row*Cin, row*Cout) mod 128
offsets), and the per-channel (Cin, Cout) taps are read off the occupied
diagonal cells afterwards (`_extract_wgrad`).  Rows whose conv-pad source is
out of range contribute zero because the circular lane roll wraps in a
zero-padded row block (L >= (H+1)*C for every chain shape).

The BatchNorm fold stays OUTSIDE the custom_vjp, so bn_scale/bn_bias/bn_mean/
bn_var/b1/bd cotangents come from plain autodiff through the fold; the kernel
only produces tensor-valued grads.  Gradient parity vs the f32 reference
chain: tests/test_resblock_packed_vjp.py (interpreter mode) and the real-TPU
check in benchmarks/check_resblock_parity.py.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .resblock_packed import (
    LANE,
    _ceil_to,
    _conv_tap_blocks,
    _lane_vec,
    _pick_wt,
    fused_resblock_packed,
    pack_hwc,
    unpack_hwc,
)

SELU_L, SELU_A = 1.0507009873554805, 1.6732632423543772


def _phase_count(c_src: int, c_dst: int, t_dst: int) -> int:
    """Accumulator phases for a conv's weight grad: dst tiles j and j+P have
    identical (src, dst) lane alignment, so their (128, 128) products may be
    summed without mixing rows."""
    rpd = LANE // c_dst
    for p in range(1, t_dst + 1):
        if (p * rpd * c_src) % LANE == 0:
            return p
    return max(t_dst, 1)


def _extract_wgrad(g_acc: jax.Array, c_src: int, c_dst: int, h_src: int,
                   h_dst: int, deltas: Sequence[int]) -> jax.Array:
    """(kh*3, P, 128, 128) phase accumulators -> (kh, 3, Cin, Cout) tap grads.

    Sums each occupied diagonal cell once; rows sharing a cell were already
    summed inside the kernel."""
    kh = len(deltas)
    p_total = g_acc.shape[1]
    taps = []
    for dh in range(kh):
        cells = []
        seen = set()
        for r in range(h_dst):
            if not 0 <= r + deltas[dh] < h_src:
                continue
            key = (((r * c_dst) // LANE) % p_total,
                   (r * c_src) % LANE, (r * c_dst) % LANE)
            if key not in seen:
                seen.add(key)
                cells.append(key)
        for dw in range(3):
            g = jnp.zeros((c_src, c_dst), jnp.float32)
            for ph, so, do in cells:
                g = g + jax.lax.dynamic_slice(
                    g_acc[dh * 3 + dw, ph], (so, do), (c_src, c_dst)
                )
            taps.append(g)
    return jnp.stack(taps).reshape(kh, 3, c_src, c_dst)


def _fold_lanes(v: jax.Array, h: int, c: int) -> jax.Array:
    """(1|2-d lane vector, L) -> (C,): sum the per-row-block copies."""
    flat = v.reshape(-1)[: h * c]
    return flat.reshape(h, c).sum(axis=0)


def _resblock_bwd_kernel(
    x_ref, g_ref, c1_ref, c2_ref, ds_ref, aff_ref,
    dx_ref, dw1_ref, dw2_ref, dwd_ref, dsc_ref, db2_ref,
    xw, gw, pre, zb, dyb, dzb, tmpa, tmpb,
    *, WT: int, use_ds: bool, n_tiles: int, w_true: int,
    Cin: int, Cout: int, c1_src, c2_src, ds_src,
    T_z: int, T_out: int, P1: int, P2: int, Pd: int, prec,
):
    t = pl.program_id(1)
    b = pl.program_id(0)
    PT = WT // 3
    NZ, NY, ND = WT + 10, WT + 6, WT + 2
    L_in = xw.shape[-1]
    L_z = pre.shape[-1]

    @pl.when(t == 0)
    def _():
        xw[:] = jnp.zeros_like(xw)
        gw[:] = jnp.zeros_like(gw)

    @pl.when((t == 0) & (b == 0))
    def _():
        dw1_ref[:] = jnp.zeros_like(dw1_ref)
        dw2_ref[:] = jnp.zeros_like(dw2_ref)
        dwd_ref[:] = jnp.zeros_like(dwd_ref)
        dsc_ref[:] = jnp.zeros_like(dsc_ref)
        db2_ref[:] = jnp.zeros_like(db2_ref)

    x_cur = x_ref[0]   # (WT, L_in)
    g_cur = g_ref[0]   # (PT, L_out)
    fill_x = jnp.where(t < n_tiles, x_cur[0:6, :], jnp.zeros_like(x_cur[0:6, :]))
    xw[WT + 6: WT + 12, :] = fill_x.astype(xw.dtype)
    fill_g = jnp.where(t < n_tiles, g_cur[0:1, :], jnp.zeros_like(g_cur[0:1, :]))
    gw[PT + 1: PT + 2, :] = fill_g.astype(gw.dtype)

    xf = xw[:]  # window col u <-> true x col base - 6 + u, base = (t-1)*WT
    gwf = gw[:]

    def lane_roll(a, shift):
        if shift % a.shape[-1] == 0:
            return a
        if a.dtype.itemsize == 4:
            return pltpu.roll(a, shift=shift, axis=1)
        return pltpu.roll(a.astype(jnp.float32), shift=shift, axis=1).astype(
            a.dtype
        )

    def roll0(a, shift):
        return pltpu.roll(a, shift=shift, axis=0)

    xrolls = (lane_roll(xf, Cin), xf)  # conv1 deltas (-1, 0)

    # ---- stage 1: recompute pre & z on ext z cols v = base - 5 + i ----
    iz = jax.lax.broadcasted_iota(jnp.int32, (NZ, 1), 0)
    vz = (t - 1) * WT - 5 + iz
    zvalid = (vz >= 0) & (vz < w_true)
    for j in range(T_z):
        acc = None
        for dh in range(2):
            s = c1_src[dh][j] * LANE
            xr = xrolls[dh]
            for dw in range(3):
                d = jax.lax.dot(
                    xr[dw: dw + NZ, s: s + LANE], c1_ref[dh * 3 + dw, j],
                    preferred_element_type=jnp.float32, precision=prec,
                )
                acc = d if acc is None else acc + d
        pre[:, j * LANE: (j + 1) * LANE] = acc
        scale = aff_ref[0, j * LANE: (j + 1) * LANE].astype(jnp.float32)
        shift = aff_ref[1, j * LANE: (j + 1) * LANE].astype(jnp.float32)
        a = acc * scale[None, :] + shift[None, :]
        zt = SELU_L * jnp.where(
            a > 0, a, SELU_A * (jnp.exp(jnp.minimum(a, 0.0)) - 1.0)
        )
        zb[:, j * LANE: (j + 1) * LANE] = jnp.where(zvalid, zt, 0.0).astype(
            zb.dtype
        )

    # ---- stage 2: recompute y (ext y cols w = base - 3 + m), route pool ----
    zfull = zb[:]
    zrolls = (zfull, lane_roll(zfull, L_z - Cout))  # conv2 deltas (0, 1)
    iy = jax.lax.broadcasted_iota(jnp.int32, (NY, 1), 0)
    wy = (t - 1) * WT - 3 + iy
    yvalid = (wy >= 0) & (wy < 3 * (w_true // 3))
    m3 = iy % 3

    def pick3(a):
        # broadcast the 3k-row value to rows 3k+1, 3k+2 (exact, no matmul)
        return jnp.where(
            m3 == 0, a, jnp.where(m3 == 1, roll0(a, 1), roll0(a, 2))
        )

    mrow = jax.lax.broadcasted_iota(jnp.int32, (NY, PT + 2), 0)
    qcol = jax.lax.broadcasted_iota(jnp.int32, (NY, PT + 2), 1)
    selg_t = (mrow // 3 == qcol).astype(xf.dtype)  # (NY, PT+2)

    for j in range(T_out):
        acc = None
        for dh in range(2):
            s = c2_src[dh][j] * LANE
            zr = zrolls[dh]
            for dw in range(3):
                d = jax.lax.dot(
                    zr[1 + dw: 1 + dw + NY, s: s + LANE],
                    c2_ref[dh * 3 + dw, j],
                    preferred_element_type=jnp.float32, precision=prec,
                )
                acc = d if acc is None else acc + d
        if use_ds:
            s = ds_src[0][j] * LANE
            for dw in range(3):
                d = jax.lax.dot(
                    xf[2 + dw: 2 + dw + NY, s: s + LANE], ds_ref[dw, j],
                    preferred_element_type=jnp.float32, precision=prec,
                )
                acc = acc + d
        else:
            acc = acc + xf[3: 3 + NY, j * LANE: (j + 1) * LANE].astype(
                jnp.float32
            )
        y = acc  # b2 omitted: per-lane constant, argmax-invariant
        ymax = jnp.maximum(jnp.maximum(y, roll0(y, NY - 1)), roll0(y, NY - 2))
        gcol = pick3(ymax)
        eq = (y == gcol).astype(jnp.float32)
        ecnt = eq + roll0(eq, NY - 1) + roll0(eq, NY - 2)
        cnt = pick3(ecnt)
        gexp = jax.lax.dot(
            selg_t, gwf[:, j * LANE: (j + 1) * LANE],
            preferred_element_type=jnp.float32, precision=prec,
        )
        dy = jnp.where(yvalid, eq * gexp / cnt, 0.0)
        db2_ref[0:1, j * LANE: (j + 1) * LANE] += jnp.sum(
            dy[3: 3 + WT, :], axis=0, keepdims=True
        )
        dyb[:, j * LANE: (j + 1) * LANE] = dy.astype(dyb.dtype)

    # ---- stage 3: dz = conv2^T(dy); da = dz * selu'(a); dpre = da*scale ----
    dyf = dyb[:]
    for dh in range(2):
        tmp = tmpa if dh == 0 else tmpb
        tmp[:] = jnp.zeros_like(tmp)
        for j in range(T_out):
            s = c2_src[dh][j] * LANE
            acc = None
            for dw in range(3):
                d = jax.lax.dot_general(
                    dyf[3 - dw: 3 - dw + ND, j * LANE: (j + 1) * LANE],
                    c2_ref[dh * 3 + dw, j],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                acc = d if acc is None else acc + d
            tmp[:, s: s + LANE] += acc
    # undo the conv2 lane rolls: dh=0 none, dh=1 inverse of roll(L_z - Cout)
    dzf = tmpa[:] + pltpu.roll(tmpb[:], shift=Cout, axis=1)

    idd = jax.lax.broadcasted_iota(jnp.int32, (ND, 1), 0)
    vd = (t - 1) * WT - 1 + idd
    dvalid = (vd >= 0) & (vd < w_true)
    pre_s = pre[4: 4 + ND, :]
    scale_full = aff_ref[0:1, :].astype(jnp.float32)
    shift_full = aff_ref[1:2, :].astype(jnp.float32)
    a_s = pre_s * scale_full + shift_full
    sup = jnp.where(
        a_s > 0, SELU_L, SELU_L * SELU_A * jnp.exp(jnp.minimum(a_s, 0.0))
    )
    da = jnp.where(dvalid, dzf * sup, 0.0)
    dsc_ref[0:1, :] += jnp.sum(da[1: 1 + WT, :] * pre_s[1: 1 + WT, :],
                               axis=0, keepdims=True)
    dsc_ref[1:2, :] += jnp.sum(da[1: 1 + WT, :], axis=0, keepdims=True)
    dzb[:] = (da * scale_full).astype(dzb.dtype)

    # ---- stage 4: dx = conv1^T(dpre) + (ds^T(dy) | dy) ----
    dzf2 = dzb[:]
    tmpb[:] = jnp.zeros_like(tmpb)  # dx accumulator (rows [0:WT], lanes [0:L_in])
    for dh in range(2):
        tmpa[:] = jnp.zeros_like(tmpa)
        for j in range(T_z):
            s = c1_src[dh][j] * LANE
            acc = None
            for dw in range(3):
                d = jax.lax.dot_general(
                    dzf2[2 - dw: 2 - dw + WT, j * LANE: (j + 1) * LANE],
                    c1_ref[dh * 3 + dw, j],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                acc = d if acc is None else acc + d
            tmpa[0:WT, s: s + LANE] += acc
        part = tmpa[0:WT, 0:L_in]
        if dh == 0:  # inverse of the conv1 dh=0 roll (+Cin)
            part = pltpu.roll(part, shift=L_in - Cin, axis=1)
        tmpb[0:WT, 0:L_in] += part
    if use_ds:
        tmpa[:] = jnp.zeros_like(tmpa)
        for j in range(T_out):
            s = ds_src[0][j] * LANE
            acc = None
            for dw in range(3):
                d = jax.lax.dot_general(
                    dyf[4 - dw: 4 - dw + WT, j * LANE: (j + 1) * LANE],
                    ds_ref[dw, j],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                acc = d if acc is None else acc + d
            tmpa[0:WT, s: s + LANE] += acc
        tmpb[0:WT, 0:L_in] += tmpa[0:WT, 0:L_in]
    else:
        tmpb[0:WT, 0:L_in] += dyf[3: 3 + WT, 0:L_in].astype(jnp.float32)
    dx_ref[0] = tmpb[0:WT, 0:L_in].astype(dx_ref.dtype)

    # ---- stage 5: weight grads (TN dots into phase accumulators) ----
    dzv = dzb[1: 1 + WT, :]
    for dh in range(2):
        xr = xrolls[dh]
        for dw in range(3):
            for j in range(T_z):
                s = c1_src[dh][j] * LANE
                g = jax.lax.dot_general(
                    xr[5 + dw: 5 + dw + WT, s: s + LANE],
                    dzv[:, j * LANE: (j + 1) * LANE],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                dw1_ref[dh * 3 + dw, j % P1] += g
    dyv = dyb[3: 3 + WT, :]
    for dh in range(2):
        zr = zrolls[dh]
        for dw in range(3):
            for j in range(T_out):
                s = c2_src[dh][j] * LANE
                g = jax.lax.dot_general(
                    zr[4 + dw: 4 + dw + WT, s: s + LANE],
                    dyv[:, j * LANE: (j + 1) * LANE],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                dw2_ref[dh * 3 + dw, j % P2] += g
    if use_ds:
        for dw in range(3):
            for j in range(T_out):
                s = ds_src[0][j] * LANE
                g = jax.lax.dot_general(
                    xf[5 + dw: 5 + dw + WT, s: s + LANE],
                    dyv[:, j * LANE: (j + 1) * LANE],
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                dwd_ref[dw, j % Pd] += g

    # slide the lag windows
    xw[0:6, :] = xw[WT: WT + 6, :]
    xw[6: WT + 6, :] = x_cur.astype(xw.dtype)
    gw[0:1, :] = gw[PT: PT + 1, :]
    gw[1: PT + 1, :] = g_cur.astype(gw.dtype)


def _vmem_usage_bwd(wt: int, cin: int, cout: int, h: int,
                    itemsize: int = 2) -> int:
    """Rough model of the backward kernel's resident VMEM at tile size wt."""
    h1 = h + 1
    l_in = _ceil_to(max(h * cin, 1), LANE)
    l_z = _ceil_to(h1 * cout, LANE)
    l_out = _ceil_to(h * cout, LANE)
    t_z, t_out = l_z // LANE, l_out // LANE
    taps = (6 * t_z + 9 * t_out) * LANE * LANE * itemsize
    p1 = _phase_count(cin, cout, t_z)
    p2 = _phase_count(cout, cout, t_out)
    pd = _phase_count(cin, cout, t_out) if cin != cout else 1
    accs = (6 * p1 + 6 * p2 + 3 * pd) * LANE * LANE * 4

    pt = wt // 3
    return (
        2 * wt * l_in * itemsize        # x input double buffer
        + 2 * pt * l_out * itemsize     # g input double buffer
        + (wt + 12) * l_in * itemsize   # x lag window
        + (pt + 2) * l_out * itemsize   # g lag window
        + (wt + 10) * l_z * 4           # pre (f32)
        + (wt + 10) * l_z * itemsize    # z
        + (wt + 6) * l_out * itemsize   # dy
        + (wt + 2) * l_z * itemsize     # dpre
        + 2 * (wt + 2) * l_z * 4        # tmpa/tmpb (f32)
        + 2 * wt * l_in * itemsize      # dx output double buffer
        + (wt + 12) * l_in * 4          # lane_roll f32 detour (x)
        + (wt + 10) * l_z * 4           # lane_roll f32 detour (z)
        + 4 * (wt + 2) * l_z * 4        # dzf/da/sup/dpre temporaries
        + 8 * (wt + 10) * LANE * 4      # per-dst-tile f32 temporaries
        + taps + accs
    )


def _pick_wt_bwd(w_true: int, cin: int, cout: int, h: int,
                 budget_bytes: int = 13 * 1024 * 1024,
                 itemsize: int = 2) -> int:
    """Largest pool-and-sublane-aligned W tile whose modeled VMEM fits the
    budget; falls back to 24 (the wrapper then raises the Mosaic scoped-vmem
    limit to the modeled need — f32 tap stacks alone can exceed 16 MB)."""
    for wt in (2400, 1800, 1200, 960, 720, 600, 480, 360, 240, 120, 72, 48, 24):
        if wt <= max(24, _ceil_to(w_true, 24)) and (
            _vmem_usage_bwd(wt, cin, cout, h, itemsize) <= budget_bytes
        ):
            return wt
    return 24


def fused_resblock_packed_bwd(
    x_packed: jax.Array, g: jax.Array, H: int,
    w1: jax.Array, scale: jax.Array, shift: jax.Array, w2: jax.Array,
    wd: Optional[jax.Array], *, w_true: int, wt: Optional[int] = None,
):
    """Backward of the packed block: cotangents from the pooled-output grad.

    x_packed: (B, w_true, L_in) saved block input; g: cotangent shaped like
    the forward output (B, >= w_true // 3 tiles, L_out).  Returns
    (dx (B, w_true, L_in), dw1, d_scale (Cout,), d_shift, dw2, db2_eff, dwd).
    """
    B, W, L_in = x_packed.shape
    Cin, Cout = w1.shape[2], w1.shape[3]
    assert W == w_true, (W, w_true)
    H1 = H + 1
    L_z = _ceil_to(H1 * Cout, LANE)
    L_out = _ceil_to(H * Cout, LANE)

    if wt is None:
        wt = _pick_wt_bwd(w_true, Cin, Cout, H,
                          itemsize=x_packed.dtype.itemsize)
    assert wt % 24 == 0, wt
    # Mosaic's default scoped-vmem limit is 16 MB; the f32 (test) path's tap
    # stacks alone can exceed it.  Raise the limit to the modeled need plus
    # margin — v5e VMEM is far larger than the default scope.
    vmem_need = _vmem_usage_bwd(wt, Cin, Cout, H, x_packed.dtype.itemsize)
    vmem_limit = int(min(96 * 1024 * 1024,
                         max(16 * 1024 * 1024, vmem_need + 6 * 1024 * 1024)))
    PT = wt // 3
    n_tiles = -(-w_true // wt)
    Wp = n_tiles * wt
    x_p = jnp.pad(x_packed, ((0, 0), (0, Wp - W), (0, 0)))
    g_p = jnp.pad(
        g[:, : w_true // 3, :],
        ((0, 0), (0, n_tiles * PT - w_true // 3), (0, 0)),
    ).astype(x_packed.dtype)

    c1_blocks, c1_src = _conv_tap_blocks(w1, H, H1, (-1, 0), L_in, L_z)
    c2_blocks, c2_src = _conv_tap_blocks(w2, H1, H, (0, 1), L_z, L_out)
    use_ds = wd is not None
    T_z, T_out = L_z // LANE, L_out // LANE
    if use_ds:
        ds_blocks, ds_src = _conv_tap_blocks(wd, H, H, (0,), L_in, L_out)
    else:
        ds_blocks = jnp.zeros((3, 1, LANE, LANE), jnp.float32)
        ds_src = [[0] * T_out]
    P1 = _phase_count(Cin, Cout, T_z)
    P2 = _phase_count(Cout, Cout, T_out)
    Pd = _phase_count(Cin, Cout, T_out) if use_ds else 1

    aff = jnp.concatenate(
        [_lane_vec(scale, H1, L_z), _lane_vec(shift, H1, L_z)], axis=0
    )
    cdt = x_packed.dtype
    c1_blocks = c1_blocks.astype(cdt)
    c2_blocks = c2_blocks.astype(cdt)
    ds_blocks = ds_blocks.astype(cdt)
    ds_t = ds_blocks.shape[1]

    c1_src = tuple(tuple(s) for s in c1_src)
    c2_src = tuple(tuple(s) for s in c2_src)
    ds_src = tuple(tuple(s) for s in ds_src)

    out = pl.pallas_call(
        functools.partial(
            _resblock_bwd_kernel,
            WT=wt, use_ds=use_ds, n_tiles=n_tiles, w_true=w_true,
            Cin=Cin, Cout=Cout, c1_src=c1_src, c2_src=c2_src, ds_src=ds_src,
            T_z=T_z, T_out=T_out, P1=P1, P2=P2, Pd=Pd,
            prec=jax.lax.Precision.DEFAULT,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Wp, L_in), cdt),
            jax.ShapeDtypeStruct((6, P1, LANE, LANE), jnp.float32),
            jax.ShapeDtypeStruct((6, P2, LANE, LANE), jnp.float32),
            jax.ShapeDtypeStruct((3, Pd, LANE, LANE), jnp.float32),
            jax.ShapeDtypeStruct((2, L_z), jnp.float32),
            jax.ShapeDtypeStruct((1, L_out), jnp.float32),
        ),
        grid=(B, n_tiles + 1),
        in_specs=[
            pl.BlockSpec(
                (1, wt, L_in),
                lambda b, t: (b, jnp.minimum(t, n_tiles - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, PT, L_out),
                lambda b, t: (b, jnp.minimum(t, n_tiles - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((6, T_z, LANE, LANE), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, T_out, LANE, LANE), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, ds_t, LANE, LANE), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, L_z), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, wt, L_in), lambda b, t: (b, jnp.maximum(t - 1, 0), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((6, P1, LANE, LANE), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, P2, LANE, LANE), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, Pd, LANE, LANE), lambda b, t: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, L_z), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L_out), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((wt + 12, L_in), cdt),       # x lag window
            pltpu.VMEM((PT + 2, L_out), cdt),       # g lag window
            pltpu.VMEM((wt + 10, L_z), jnp.float32),  # pre
            pltpu.VMEM((wt + 10, L_z), cdt),        # z
            pltpu.VMEM((wt + 6, L_out), cdt),       # dy
            pltpu.VMEM((wt + 2, L_z), cdt),         # dpre
            pltpu.VMEM((wt + 2, L_z), jnp.float32),  # tmpa
            pltpu.VMEM((wt + 2, L_z), jnp.float32),  # tmpb
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem_limit),
    )(x_p, g_p, c1_blocks, c2_blocks, ds_blocks, aff)

    dx_p, g1, g2, gd, dsc, db2l = out
    dx = dx_p[:, :w_true, :]
    dw1 = _extract_wgrad(g1, Cin, Cout, H, H1, (-1, 0))
    dw2 = _extract_wgrad(g2, Cout, Cout, H1, H, (0, 1))
    dwd = _extract_wgrad(gd, Cin, Cout, H, H, (0,)) if use_ds else None
    d_scale = _fold_lanes(dsc[0], H1, Cout)
    d_shift = _fold_lanes(dsc[1], H1, Cout)
    db2 = _fold_lanes(db2l[0], H, Cout)
    return dx, dw1, d_scale, d_shift, dw2, db2, dwd


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _packed_block_core(H: int, w_true: int, x_packed, w1, scale, shift,
                       w2, b2_eff, wd):
    """Forward = the packed Pallas kernel with a pre-folded BN affine.

    Passing bn_var=1, eps=0 makes the kernel's internal fold the identity,
    so (scale, shift, b2_eff) are consumed verbatim.
    """
    zeros = jnp.zeros_like(b2_eff)
    wt = _pick_wt(w_true, w1.shape[2], w1.shape[3], H,
                  itemsize=x_packed.dtype.itemsize)
    return fused_resblock_packed(
        x_packed, H, w1, zeros, scale, shift, zeros, jnp.ones_like(scale),
        w2, b2_eff, wd, zeros if wd is not None else None,
        eps=0.0, wt=wt, w_true=w_true,
    )


def _core_fwd(H, w_true, x_packed, w1, scale, shift, w2, b2_eff, wd):
    out = _packed_block_core(H, w_true, x_packed, w1, scale, shift, w2,
                             b2_eff, wd)
    return out, (x_packed, w1, scale, shift, w2, wd)


def _core_bwd(H, w_true, residuals, g):
    x_packed, w1, scale, shift, w2, wd = residuals
    dx, dw1, d_scale, d_shift, dw2, db2, dwd = fused_resblock_packed_bwd(
        x_packed, g, H, w1, scale, shift, w2, wd, w_true=w_true
    )
    return (dx, dw1.astype(w1.dtype), d_scale.astype(scale.dtype),
            d_shift.astype(shift.dtype), dw2.astype(w2.dtype),
            db2.astype(shift.dtype),
            dwd.astype(wd.dtype) if wd is not None else None)


_packed_block_core.defvjp(_core_fwd, _core_bwd)


def packed_block_train(x_packed: jax.Array, bp: Dict[str, Any], H: int,
                       w_true: int, eps: float = 1e-5) -> jax.Array:
    """One differentiable packed block; BN fold outside the custom_vjp so
    bn_scale/bn_bias/bn_mean/bn_var/b1/bd cotangents come from autodiff."""
    inv = jax.lax.rsqrt(bp["bn_var"].astype(jnp.float32) + eps)
    scale = bp["bn_scale"].astype(jnp.float32) * inv
    shift = (
        bp["bn_bias"].astype(jnp.float32)
        + (bp["b1"].astype(jnp.float32) - bp["bn_mean"].astype(jnp.float32))
        * scale
    )
    wd = bp.get("wd")
    b2_eff = bp["b2"].astype(jnp.float32)
    if wd is not None:
        b2_eff = b2_eff + bp["bd"].astype(jnp.float32)
    return _packed_block_core(H, w_true, x_packed, bp["w1"], scale, shift,
                              bp["w2"], b2_eff, wd)


def chain_packed_native(blocks: Sequence[Dict[str, Any]], e: jax.Array,
                        eps: float = 1e-5) -> jax.Array:
    """Differentiable packed res-block chain with the native Pallas backward.

    Same signature/semantics as `resblock_grad.chain_packed_trainable` (the
    XLA-recompute variant, kept for comparison): e (B, H, W, C) -> pooled
    (B, H, W // 3**n, C_out).
    """
    B, H, W, C = e.shape
    p = pack_hwc(e)
    w_true = W
    for bp in blocks:
        p = packed_block_train(p[:, :w_true], bp, H, w_true, eps)
        w_true = w_true // 3
    cout = blocks[-1]["w1"].shape[3]
    return unpack_hwc(p[:, :w_true, :], H, cout)

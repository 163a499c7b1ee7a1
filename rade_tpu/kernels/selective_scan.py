"""Mamba selective scan: jnp reference, associative scan, and Pallas TPU kernels.

The recurrence (executable spec: `/root/reference/models/modules/mamba_block.py:65-122`,
semantics of the `mamba_ssm` CUDA kernel the reference trains with):

    h_t = exp(dt_t * A) * h_{t-1} + (dt_t * B_t) * u_t        (per channel d, state n)
    y_t = sum_n C_{t,n} * h_{t,n,d} + D_d * u_{t,d}

Three implementations, all bit-compatible to float tolerance:

- :func:`selective_scan_ref` — sequential `lax.scan` over time (the spec);
- :func:`selective_scan` — `lax.associative_scan` (log-depth, differentiable);
- :func:`selective_scan_pallas` — fused Pallas kernel: per (batch, chunk)
  grid step, the discretization, a log-step Blelloch-style scan over the
  chunk, the inter-chunk carry, and the C-contraction all run in VMEM with
  fp32 state, so the (L, N, D) intermediates never touch HBM.  Wrapped in a
  `custom_vjp` with a NATIVE Pallas backward kernel (below), so the Pallas
  path is the fast path for training as well as eval.

Backward math.  With a_l = exp(dt_l·Aᵀ), b_l = (dt_l·u_l)·B_l and incoming
cotangent g_l = dL/dy_l, the adjoint of the forward recurrence is the
REVERSE recurrence

    λ_l = C_l ⊗ g_l + a_{l+1} · λ_{l+1}          (λ_L := 0)

and the leaf gradients are

    da_l = λ_l · h_{l-1}                 dz_l = a_l · da_l   (a = exp(z))
    d dt_l,d = Σ_n dz·Aᵀ + (Σ_n λ·B)·u   du_l,d = (Σ_n λ·B)·dt + D·g
    dB_l,n  = Σ_d λ·(dt·u)               dC_l,n = Σ_d h·g
    dA_d,n  = Σ_{b,l} dz·dt              dD_d   = Σ_{b,l} u·g

The backward kernel walks the chunk grid in REVERSE, recomputes h inside
each chunk from per-chunk carries saved by the forward pass (O(B·n_chunks·N·D)
extra memory — negligible), runs the λ suffix scan in VMEM, and accumulates
dA/dD across chunks in revisited output blocks.

Shapes: u, dt (B, L, D); A (D, N); Bm, Cm (B, L, N); Dp (D,).  The exp
discretization is computed in fp32 regardless of input dtype (bf16 I/O safe).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _discretize(u, dt, A, Bm):
    """a = exp(dt*A), b = dt*B*u, computed in fp32. Returns (B, L, N, D) pair."""
    dt32 = dt.astype(jnp.float32)
    u32 = u.astype(jnp.float32)
    A32 = A.astype(jnp.float32)
    B32 = Bm.astype(jnp.float32)
    # (B, L, N, D): broadcast dt (B,L,1,D) * A^T (N,D)
    a = jnp.exp(dt32[:, :, None, :] * A32.T[None, None])
    b = (dt32 * u32)[:, :, None, :] * B32[..., None]
    return a, b


def selective_scan_ref(u, dt, A, Bm, Cm, Dp):
    """Sequential scan over time — the executable spec."""
    a, b = _discretize(u, dt, A, Bm)

    def step(h, ab):
        a_t, b_t = ab
        h = a_t * h + b_t
        return h, h

    h0 = jnp.zeros(a.shape[0:1] + a.shape[2:], jnp.float32)
    # scan over L: move L to axis 0
    _, hs = jax.lax.scan(step, h0, (a.swapaxes(0, 1), b.swapaxes(0, 1)))
    hs = hs.swapaxes(0, 1)  # (B, L, N, D)
    y = jnp.einsum("blnd,bln->bld", hs, Cm.astype(jnp.float32))
    y = y + u.astype(jnp.float32) * Dp.astype(jnp.float32)
    return y.astype(u.dtype)


def selective_scan(u, dt, A, Bm, Cm, Dp):
    """Log-depth associative scan — differentiable jnp fallback path."""
    a, b = _discretize(u, dt, A, Bm)

    def combine(left, right):
        a1, b1 = left
        a2, b2 = right
        return a1 * a2, a2 * b1 + b2

    _, hs = jax.lax.associative_scan(combine, (a, b), axis=1)
    y = jnp.einsum("blnd,bln->bld", hs, Cm.astype(jnp.float32))
    y = y + u.astype(jnp.float32) * Dp.astype(jnp.float32)
    return y.astype(u.dtype)


# ---------------------------------------------------------------------------
# Pallas TPU kernels
# ---------------------------------------------------------------------------

D_TILE = 128  # lane tiling for the channel axis


def _prefix_scan(a, b, chunk: int):
    """In-VMEM log-step inclusive scan over axis 0 of (chunk, N, D) arrays.

    Returns (a_cum, h): a_cum[l] = prod_{k<=l} a[k]; h[l] = zero-init state.
    """
    n_steps = max(1, (chunk - 1).bit_length())
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1, 1), 0)
    for s in [1 << i for i in range(n_steps)]:
        a_prev = pltpu.roll(a, shift=s, axis=0)
        b_prev = pltpu.roll(b, shift=s, axis=0)
        valid = l_idx >= s
        b = jnp.where(valid, a * b_prev + b, b)
        a = jnp.where(valid, a * a_prev, a)
    return a, b


def _suffix_scan(c, v, chunk: int):
    """λ[l] = v[l] + c[l]·λ[l+1] (reverse recurrence) via log-step scan.

    c[chunk-1] must be 0 (or v[chunk-1] must already hold the boundary term).
    """
    n_steps = max(1, (chunk - 1).bit_length())
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1, 1), 0)
    for s in [1 << i for i in range(n_steps)]:
        # circular roll by -s == roll by (chunk - s)
        c_next = pltpu.roll(c, shift=chunk - s, axis=0)
        v_next = pltpu.roll(v, shift=chunk - s, axis=0)
        valid = l_idx <= chunk - 1 - s
        v = jnp.where(valid, c * v_next + v, v)
        c = jnp.where(valid, c * c_next, c)
    return v


def _scan_kernel(
    u_ref, dt_ref, a_t_ref, b_ref, c_ref, dpar_ref, y_ref, carry_out_ref, h_carry,
    chunk: int,
):
    """One (batch, d-tile, chunk) forward grid step.

    Refs (VMEM): u/dt/y (chunk, D) with D padded to the 128-lane tiling;
    a_t = A^T (N, D); b/c (N, chunk) (transposed so the lane axis is the
    chunk, which is 128-aligned); scratch h_carry (N, D) persists across the
    chunk grid axis.  If carry_out_ref is not None the chunk-START state is
    saved there (consumed by the backward kernel).
    """
    ci = pl.program_id(2)  # chunk axis is the innermost grid dim

    @pl.when(ci == 0)
    def _():
        h_carry[:] = jnp.zeros_like(h_carry)

    if carry_out_ref is not None:
        carry_out_ref[:] = h_carry[:].astype(carry_out_ref.dtype)

    u = u_ref[:].astype(jnp.float32)  # (L, D)
    dt = dt_ref[:].astype(jnp.float32)
    at = a_t_ref[:].astype(jnp.float32)  # (N, D)
    bm = b_ref[:].astype(jnp.float32).T  # (N, L) -> (L, N)
    cm = c_ref[:].astype(jnp.float32).T

    # discretize in fp32: a (L, N, D), b (L, N, D)
    a = jnp.exp(dt[:, None, :] * at[None])
    b = (dt * u)[:, None, :] * bm[..., None]

    a_cum, h = _prefix_scan(a, b, chunk)

    # apply inter-chunk carry: h[l] += a_cum[l] * h_carry
    h = h + a_cum * h_carry[None]
    h_carry[:] = h[chunk - 1]

    # y = sum_n C[l,n] h[l,n,d] + D*u
    y = jnp.sum(h * cm[..., None], axis=1) + u * dpar_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _pad_args(u, dt, A, Bm, Cm, Dp, chunk):
    bsz, L, D = u.shape
    N = A.shape[1]
    Lp = -(-L // chunk) * chunk
    Dpad = -(-D // D_TILE) * D_TILE
    Np = -(-N // 8) * 8
    u_p = jnp.pad(u, [(0, 0), (0, Lp - L), (0, Dpad - D)])
    dt_p = jnp.pad(dt, [(0, 0), (0, Lp - L), (0, Dpad - D)])
    Bm_p = jnp.pad(Bm, [(0, 0), (0, Lp - L), (0, Np - N)]).transpose(0, 2, 1)
    Cm_p = jnp.pad(Cm, [(0, 0), (0, Lp - L), (0, Np - N)]).transpose(0, 2, 1)
    At_p = jnp.pad(A.T, [(0, Np - N), (0, Dpad - D)])
    D_p = jnp.pad(Dp, [(0, Dpad - D)])[None, :]  # (1, D_pad)
    return (u_p, dt_p, At_p, Bm_p, Cm_p, D_p), (Lp, Dpad, Np)


def _selective_scan_pallas_fwd_impl(u, dt, A, Bm, Cm, Dp, chunk: int, save_carries=False):
    bsz, L, D = u.shape
    N = A.shape[1]
    # Mosaic tiling: last block dim must be a multiple of 128 lanes,
    # second-to-last a multiple of 8 sublanes. Pad L to the chunk (a power of
    # two >= 128 on hardware), pad D to 128, and transpose B/C so their lane
    # axis is the chunk.
    (u_p, dt_p, At_p, Bm_p, Cm_p, D_p), (Lp, Dpad, Np) = _pad_args(
        u, dt, A, Bm, Cm, Dp, chunk
    )
    n_chunks = Lp // chunk
    n_dtiles = Dpad // D_TILE

    # grid: (batch, d-tile, chunk) — chunk innermost so the per-(b, d-tile)
    # carry in scratch stays valid across sequential chunk steps
    grid = (bsz, n_dtiles, n_chunks)
    ld_spec = pl.BlockSpec(
        (1, chunk, D_TILE), lambda b, d, c: (b, c, d), memory_space=pltpu.VMEM
    )
    nl_spec = pl.BlockSpec(
        (1, Np, chunk), lambda b, d, c: (b, 0, c), memory_space=pltpu.VMEM
    )

    out_shape = [jax.ShapeDtypeStruct((bsz, Lp, Dpad), u.dtype)]
    out_specs = [ld_spec]
    if save_carries:
        out_shape.append(jax.ShapeDtypeStruct((bsz, n_chunks, Np, Dpad), jnp.float32))
        out_specs.append(
            pl.BlockSpec(
                (1, 1, Np, D_TILE), lambda b, d, c: (b, c, 0, d),
                memory_space=pltpu.VMEM,
            )
        )

    def kernel(u_r, dt_r, at_r, b_r, c_r, d_r, *outs):
        if save_carries:
            y_r, carry_r, h_carry = outs
            carry_r = carry_r.at[0, 0]
        else:
            y_r, h_carry = outs
            carry_r = None
        _scan_kernel(
            u_r.at[0], dt_r.at[0], at_r, b_r.at[0], c_r.at[0], d_r, y_r.at[0],
            carry_r, h_carry, chunk,
        )

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            ld_spec,
            ld_spec,
            pl.BlockSpec((Np, D_TILE), lambda b, d, c: (0, d), memory_space=pltpu.VMEM),
            nl_spec,
            nl_spec,
            pl.BlockSpec((1, D_TILE), lambda b, d, c: (0, d), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((Np, D_TILE), jnp.float32)],
    )(u_p, dt_p, At_p, Bm_p, Cm_p, D_p)
    y = outs[0][:, :L, :D]
    if save_carries:
        return y, outs[1]
    return y


def _scan_bwd_kernel(
    u_ref, dt_ref, a_t_ref, b_ref, c_ref, dpar_ref, g_ref, h0_ref,
    du_ref, ddt_ref, dbt_ref, dct_ref, da_ref, dd_ref,
    lam_carry, chunk: int,
):
    """One (batch, d-tile, reversed-chunk) backward grid step.

    Recomputes h inside the chunk from the saved chunk-start carry h0, runs
    the λ suffix scan with the cross-chunk carry in scratch, and emits all
    leaf gradients.  da/dd output blocks are revisited across the chunk axis
    (their index maps ignore it) and accumulated in place.
    """
    ci = pl.program_id(2)  # iteration step; chunks are visited right-to-left

    @pl.when(ci == 0)
    def _():
        lam_carry[:] = jnp.zeros_like(lam_carry)
        da_ref[:] = jnp.zeros_like(da_ref)
        dd_ref[:] = jnp.zeros_like(dd_ref)

    u = u_ref[:].astype(jnp.float32)  # (L, D)
    dt = dt_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    at = a_t_ref[:].astype(jnp.float32)  # (N, D)
    bm = b_ref[:].astype(jnp.float32).T  # (L, N)
    cm = c_ref[:].astype(jnp.float32).T
    h0 = h0_ref[:].astype(jnp.float32)  # (N, D) chunk-start state

    a0 = jnp.exp(dt[:, None, :] * at[None])  # (L, N, D)
    b0 = (dt * u)[:, None, :] * bm[..., None]

    # recompute h over the chunk
    a_cum, h = _prefix_scan(a0, b0, chunk)
    h = h + a_cum * h0[None]
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1, 1), 0)
    h_prev = jnp.where(l_idx == 0, h0[None], pltpu.roll(h, shift=1, axis=0))

    # λ suffix scan: λ_l = C_l⊗g_l + a_{l+1}·λ_{l+1}; the cross-chunk term
    # a_first·λ_first of the chunk to the RIGHT is seeded into v[chunk-1]
    dh = cm[..., None] * g[:, None, :]  # (L, N, D)
    c_coef = jnp.where(
        l_idx == chunk - 1, 0.0, pltpu.roll(a0, shift=chunk - 1, axis=0)
    )
    v = jnp.where(l_idx == chunk - 1, dh + lam_carry[None], dh)
    lam = _suffix_scan(c_coef, v, chunk)
    lam_carry[:] = a0[0] * lam[0]

    dz = a0 * lam * h_prev  # = a · da,   z = dt·Aᵀ
    lam_b = jnp.sum(lam * bm[..., None], axis=1)  # (L, D) = d(dt·u)
    ddt = jnp.sum(dz * at[None], axis=1) + lam_b * u
    du = lam_b * dt + dpar_ref[:].astype(jnp.float32) * g
    dbt = jnp.sum(lam * (dt * u)[:, None, :], axis=2).T  # (N, L)
    dct = jnp.sum(h * g[:, None, :], axis=2).T  # (N, L)

    du_ref[:] = du.astype(du_ref.dtype)
    ddt_ref[:] = ddt.astype(ddt_ref.dtype)
    dbt_ref[:] = dbt.astype(dbt_ref.dtype)
    dct_ref[:] = dct.astype(dct_ref.dtype)
    da_ref[:] = da_ref[:] + jnp.sum(dz * dt[:, None, :], axis=0)
    # (8, D) block with identical rows — Mosaic needs >=8 sublanes per block
    dd_ref[:] = dd_ref[:] + jnp.sum(u * g, axis=0)[None]


def _selective_scan_pallas_bwd_impl(u, dt, A, Bm, Cm, Dp, carries, g, chunk: int):
    bsz, L, D = u.shape
    N = A.shape[1]
    (u_p, dt_p, At_p, Bm_p, Cm_p, D_p), (Lp, Dpad, Np) = _pad_args(
        u, dt, A, Bm, Cm, Dp, chunk
    )
    g_p = jnp.pad(g, [(0, 0), (0, Lp - L), (0, Dpad - D)])
    n_chunks = Lp // chunk
    n_dtiles = Dpad // D_TILE
    nc1 = n_chunks - 1

    grid = (bsz, n_dtiles, n_chunks)
    # chunk grid axis iterates REVERSED (right-to-left) via the index maps
    ld_spec = pl.BlockSpec(
        (1, chunk, D_TILE), lambda b, d, c: (b, nc1 - c, d), memory_space=pltpu.VMEM
    )
    nl_spec = pl.BlockSpec(
        (1, Np, chunk), lambda b, d, c: (b, 0, nc1 - c), memory_space=pltpu.VMEM
    )

    def kernel(u_r, dt_r, at_r, b_r, c_r, d_r, g_r, h0_r,
               du_r, ddt_r, dbt_r, dct_r, da_r, dd_r, lam_carry):
        _scan_bwd_kernel(
            u_r.at[0], dt_r.at[0], at_r, b_r.at[0], c_r.at[0], d_r, g_r.at[0],
            h0_r.at[0, 0],
            du_r.at[0], ddt_r.at[0], dbt_r.at[0, 0], dct_r.at[0, 0],
            da_r.at[0], dd_r.at[0],
            lam_carry, chunk,
        )

    outs = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, Lp, Dpad), u.dtype),  # du
            jax.ShapeDtypeStruct((bsz, Lp, Dpad), dt.dtype),  # ddt
            jax.ShapeDtypeStruct((bsz, n_dtiles, Np, Lp), jnp.float32),  # dBᵀ
            jax.ShapeDtypeStruct((bsz, n_dtiles, Np, Lp), jnp.float32),  # dCᵀ
            jax.ShapeDtypeStruct((bsz, Np, Dpad), jnp.float32),  # dAᵀ partial
            jax.ShapeDtypeStruct((bsz, 8, Dpad), jnp.float32),  # dD partial (8 dup rows)
        ],
        grid=grid,
        in_specs=[
            ld_spec,
            ld_spec,
            pl.BlockSpec((Np, D_TILE), lambda b, d, c: (0, d), memory_space=pltpu.VMEM),
            nl_spec,
            nl_spec,
            pl.BlockSpec((1, D_TILE), lambda b, d, c: (0, d), memory_space=pltpu.VMEM),
            ld_spec,  # g
            pl.BlockSpec(  # saved carries (B, n_chunks, Np, Dpad)
                (1, 1, Np, D_TILE), lambda b, d, c: (b, nc1 - c, 0, d),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            ld_spec,
            ld_spec,
            pl.BlockSpec(
                (1, 1, Np, chunk), lambda b, d, c: (b, d, 0, nc1 - c),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, Np, chunk), lambda b, d, c: (b, d, 0, nc1 - c),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, Np, D_TILE), lambda b, d, c: (b, 0, d), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 8, D_TILE), lambda b, d, c: (b, 0, d), memory_space=pltpu.VMEM
            ),
        ],
        scratch_shapes=[pltpu.VMEM((Np, D_TILE), jnp.float32)],
    )(u_p, dt_p, At_p, Bm_p, Cm_p, D_p, g_p, carries)

    du_p, ddt_p, dbt_p, dct_p, da_p, dd_p = outs
    du = du_p[:, :L, :D]
    ddt = ddt_p[:, :L, :D]
    dB = dbt_p.sum(axis=1)[:, :N, :L].transpose(0, 2, 1).astype(Bm.dtype)
    dC = dct_p.sum(axis=1)[:, :N, :L].transpose(0, 2, 1).astype(Cm.dtype)
    dA = da_p.sum(axis=0)[:N, :D].T.astype(A.dtype)
    dD = dd_p[:, 0].sum(axis=0)[:D].astype(Dp.dtype)
    return du, ddt, dA, dB, dC, dD


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def selective_scan_pallas(u, dt, A, Bm, Cm, Dp, chunk: int = 256):
    """Fused Pallas scan with a native Pallas backward kernel."""
    return _selective_scan_pallas_fwd_impl(u, dt, A, Bm, Cm, Dp, chunk)


def _ss_fwd(u, dt, A, Bm, Cm, Dp, chunk):
    # the backward runs at chunk <= 128 to fit its larger VMEM working set;
    # re-run the forward at that chunk so the saved carries line up
    bwd_chunk = min(chunk, 128)
    y, carries = _selective_scan_pallas_fwd_impl(
        u, dt, A, Bm, Cm, Dp, bwd_chunk, save_carries=True
    )
    return y, (u, dt, A, Bm, Cm, Dp, carries)


def _ss_bwd(chunk, residuals, g):
    u, dt, A, Bm, Cm, Dp, carries = residuals
    bwd_chunk = min(chunk, 128)
    return _selective_scan_pallas_bwd_impl(u, dt, A, Bm, Cm, Dp, carries, g, bwd_chunk)


selective_scan_pallas.defvjp(_ss_fwd, _ss_bwd)

"""Mamba selective scan: jnp reference, associative scan, and Pallas TPU kernel.

The recurrence (executable spec: `/root/reference/models/modules/mamba_block.py:65-122`,
semantics of the `mamba_ssm` CUDA kernel the reference trains with):

    h_t = exp(dt_t * A) * h_{t-1} + (dt_t * B_t) * u_t        (per channel d, state n)
    y_t = sum_n C_{t,n} * h_{t,n,d} + D_d * u_{t,d}

Three implementations, all bit-compatible to float tolerance:

- :func:`selective_scan_ref` — sequential `lax.scan` over time (the spec);
- :func:`selective_scan` — `lax.associative_scan` (log-depth, differentiable,
  the training path; XLA fuses the elementwise discretization);
- :func:`selective_scan_pallas` — fused Pallas kernel: per (batch, chunk)
  grid step, the discretization, a log-step Blelloch-style scan over the
  chunk, the inter-chunk carry, and the C-contraction all run in VMEM with
  fp32 state, so the (L, N, D) intermediates never touch HBM.  Wrapped in a
  `custom_vjp` whose backward differentiates the associative version.

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
    """Log-depth associative scan — the default differentiable path."""
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
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _scan_kernel(u_ref, dt_ref, a_t_ref, b_ref, c_ref, dpar_ref, y_ref, h_carry, chunk: int):
    """One (batch, chunk) grid step.

    Refs (VMEM): u/dt/y (chunk, D) with D padded to the 128-lane tiling;
    a_t = A^T (N, D); b/c (N, chunk) (transposed so the lane axis is the
    chunk, which is 128-aligned); scratch h_carry (N, D) persists across the
    chunk grid axis.
    """
    ci = pl.program_id(2)  # chunk axis is the innermost grid dim

    @pl.when(ci == 0)
    def _():
        h_carry[:] = jnp.zeros_like(h_carry)

    u = u_ref[:].astype(jnp.float32)  # (L, D)
    dt = dt_ref[:].astype(jnp.float32)
    at = a_t_ref[:].astype(jnp.float32)  # (N, D)
    bm = b_ref[:].astype(jnp.float32).T  # (N, L) -> (L, N)
    cm = c_ref[:].astype(jnp.float32).T

    # discretize in fp32: a (L, N, D), b (L, N, D)
    a = jnp.exp(dt[:, None, :] * at[None])
    b = (dt * u)[:, None, :] * bm[..., None]

    # log-step inclusive scan over the chunk axis (axis 0)
    n_steps = max(1, (chunk - 1).bit_length())
    l_idx = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1, 1), 0)
    for s in [1 << i for i in range(n_steps)]:
        a_prev = pltpu.roll(a, shift=s, axis=0)
        b_prev = pltpu.roll(b, shift=s, axis=0)
        valid = (l_idx >= s).astype(jnp.float32)
        b = jnp.where(valid > 0, a * b_prev + b, b)
        a = jnp.where(valid > 0, a * a_prev, a)

    # apply inter-chunk carry: h[l] = b[l] + a_cum[l] * h_carry
    h = b + a * h_carry[None]
    h_carry[:] = h[chunk - 1]

    # y = sum_n C[l,n] h[l,n,d] + D*u
    y = jnp.sum(h * cm[..., None], axis=1) + u * dpar_ref[:].astype(jnp.float32)
    y_ref[:] = y.astype(y_ref.dtype)


def _selective_scan_pallas_fwd_impl(u, dt, A, Bm, Cm, Dp, chunk: int):
    bsz, L, D = u.shape
    N = A.shape[1]
    # Mosaic tiling: last block dim must be a multiple of 128 lanes,
    # second-to-last a multiple of 8 sublanes. Pad L to the chunk (chunk is a
    # power of two >= 128), pad D to 128, and transpose B/C so their lane
    # axis is the chunk.
    D_TILE = 128
    Lp = -(-L // chunk) * chunk
    Dp_pad = -(-D // D_TILE) * D_TILE
    Np = -(-N // 8) * 8
    u_p = jnp.pad(u, [(0, 0), (0, Lp - L), (0, Dp_pad - D)])
    dt_p = jnp.pad(dt, [(0, 0), (0, Lp - L), (0, Dp_pad - D)])
    Bm_p = jnp.pad(Bm, [(0, 0), (0, Lp - L), (0, Np - N)]).transpose(0, 2, 1)
    Cm_p = jnp.pad(Cm, [(0, 0), (0, Lp - L), (0, Np - N)]).transpose(0, 2, 1)
    At_p = jnp.pad(A.T, [(0, Np - N), (0, Dp_pad - D)])
    D_p = jnp.pad(Dp, [(0, Dp_pad - D)])[None, :]  # (1, D_pad)
    n_chunks = Lp // chunk
    n_dtiles = Dp_pad // D_TILE

    # grid: (batch, d-tile, chunk) — chunk innermost so the per-(b, d-tile)
    # carry in scratch stays valid across sequential chunk steps
    grid = (bsz, n_dtiles, n_chunks)
    ld_spec = pl.BlockSpec(
        (1, chunk, D_TILE), lambda b, d, c: (b, c, d), memory_space=pltpu.VMEM
    )
    nl_spec = pl.BlockSpec(
        (1, Np, chunk), lambda b, d, c: (b, 0, c), memory_space=pltpu.VMEM
    )

    def kernel(u_r, dt_r, at_r, b_r, c_r, d_r, y_r, h_carry):
        _scan_kernel(
            u_r.at[0], dt_r.at[0], at_r, b_r.at[0], c_r.at[0], d_r, y_r.at[0],
            h_carry, chunk,
        )

    y = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bsz, Lp, Dp_pad), u.dtype),
        grid=grid,
        in_specs=[
            ld_spec,
            ld_spec,
            pl.BlockSpec((Np, D_TILE), lambda b, d, c: (0, d), memory_space=pltpu.VMEM),
            nl_spec,
            nl_spec,
            pl.BlockSpec((1, D_TILE), lambda b, d, c: (0, d), memory_space=pltpu.VMEM),
        ],
        out_specs=ld_spec,
        scratch_shapes=[pltpu.VMEM((Np, D_TILE), jnp.float32)],
    )(u_p, dt_p, At_p, Bm_p, Cm_p, D_p)
    return y[:, :L, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def selective_scan_pallas(u, dt, A, Bm, Cm, Dp, chunk: int = 256):
    """Fused Pallas forward; gradients flow through the associative version."""
    return _selective_scan_pallas_fwd_impl(u, dt, A, Bm, Cm, Dp, chunk)


def _ss_fwd(u, dt, A, Bm, Cm, Dp, chunk):
    y = _selective_scan_pallas_fwd_impl(u, dt, A, Bm, Cm, Dp, chunk)
    return y, (u, dt, A, Bm, Cm, Dp)


def _ss_bwd(chunk, residuals, g):
    u, dt, A, Bm, Cm, Dp = residuals
    _, vjp = jax.vjp(selective_scan, u, dt, A, Bm, Cm, Dp)
    return vjp(g)


selective_scan_pallas.defvjp(_ss_fwd, _ss_bwd)

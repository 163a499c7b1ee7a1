"""Mamba blocks: selective-state-space mixer + pre-norm bidirectional encoder.

TPU-native equivalents of the `mamba_ssm` modules the reference consumes
(`src/models/DualStreamSEMamba.py:43,445-486`; executable spec
`models/modules/mamba_block.py`):

- :class:`MambaMixer` — the official `Mamba(d_model, d_state)` layer:
  in_proj -> depthwise causal conv1d -> SiLU -> selective scan -> SiLU-gated
  residual branch -> out_proj.  The scan runs through the Pallas kernel on TPU
  (``use_pallas``) or the jnp associative scan (default, differentiable).
- :class:`PNBiMambaEncoder` — the reference `PN_BiMambas_Encoder`
  (`DualStreamSEMamba.py:445-486`): pre-norm, ONE shared mixer applied to the
  sequence and to its time-reverse, summed, LayerNorm, 4x GELU FFN, residual.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
from flax import linen as nn

from rade_tpu.kernels.selective_scan import selective_scan, selective_scan_pallas


def _dt_proj_bias_init(dt_min=1e-3, dt_max=0.1, floor=1e-4):
    """Official Mamba dt bias init: softplus(bias) log-uniform in [dt_min, dt_max]."""

    def init(key, shape, dtype=jnp.float32):
        u = jax.random.uniform(key, shape, jnp.float32)
        dt = jnp.exp(u * (math.log(dt_max) - math.log(dt_min)) + math.log(dt_min))
        dt = jnp.clip(dt, min=floor)
        # inverse of softplus
        return (dt + jnp.log(-jnp.expm1(-dt))).astype(dtype)

    return init


class MambaMixer(nn.Module):
    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d_inner = self.expand * self.d_model
        dt_rank = math.ceil(self.d_model / 16)
        L = x.shape[1]

        xz = nn.Dense(2 * d_inner, use_bias=False, name="in_proj")(x)
        x_in, res = jnp.split(xz, 2, axis=-1)

        # depthwise causal conv1d (kernel d_conv, left pad d_conv-1)
        x_in = nn.Conv(
            d_inner, (self.d_conv,),
            padding=((self.d_conv - 1, 0),),
            feature_group_count=d_inner,
            name="conv1d",
        )(x_in)
        x_in = jax.nn.silu(x_in)

        # input-dependent SSM parameters
        x_dbl = nn.Dense(dt_rank + 2 * self.d_state, use_bias=False, name="x_proj")(x_in)
        dt, Bm, Cm = jnp.split(x_dbl, [dt_rank, dt_rank + self.d_state], axis=-1)
        dt = nn.Dense(
            d_inner,
            name="dt_proj",
            kernel_init=nn.initializers.uniform(scale=2 * dt_rank**-0.5),
            bias_init=_dt_proj_bias_init(),
        )(dt)
        dt = jax.nn.softplus(dt)

        A_log = self.param(
            "A_log",
            lambda key, shape: jnp.log(
                jnp.tile(jnp.arange(1, self.d_state + 1, dtype=jnp.float32), (d_inner, 1))
            ),
            (d_inner, self.d_state),
        )
        Dp = self.param("D", nn.initializers.ones, (d_inner,))
        A = -jnp.exp(A_log)

        scan = selective_scan_pallas if self.use_pallas else selective_scan
        y = scan(x_in, dt, A, Bm, Cm, Dp)
        y = y * jax.nn.silu(res)
        return nn.Dense(self.d_model, use_bias=False, name="out_proj")(y)


class Mamba2Mixer(nn.Module):
    """Mamba-2 (SSD) mixer: multi-head state space with scalar-per-head A.

    The reference's `XLSX_SLS_Mamba2_Model` consumes a `JustBiMamba2` block
    from a module it does not ship (`fake_mamba_model.py:1596`); this is the
    Mamba-2 layer itself (in_proj -> conv over [x|B|C] -> SSD scan -> gated
    RMSNorm -> out_proj).  The SSD recurrence is expressed through the same
    selective-scan engine as Mamba-1 by broadcasting the per-head dt/A over
    the head's channels (exactly equivalent math).
    """

    d_model: int
    d_state: int = 64
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        d_inner = self.expand * self.d_model
        nheads = d_inner // self.headdim
        N = self.d_state

        zxbcdt = nn.Dense(
            2 * d_inner + 2 * N + nheads, use_bias=False, name="in_proj"
        )(x)
        z, xs, Bm, Cm, dt = jnp.split(
            zxbcdt, [d_inner, 2 * d_inner, 2 * d_inner + N, 2 * d_inner + 2 * N],
            axis=-1,
        )
        # conv over the concatenated [x, B, C] channels (mamba2 layout)
        xbc = jnp.concatenate([xs, Bm, Cm], axis=-1)
        xbc = nn.Conv(
            d_inner + 2 * N, (self.d_conv,),
            padding=((self.d_conv - 1, 0),),
            feature_group_count=d_inner + 2 * N,
            name="conv1d",
        )(xbc)
        xbc = jax.nn.silu(xbc)
        xs, Bm, Cm = jnp.split(xbc, [d_inner, d_inner + N], axis=-1)

        dt_bias = self.param("dt_bias", _dt_proj_bias_init(), (nheads,))
        dt = jax.nn.softplus(dt + dt_bias)  # (B, L, nheads)
        A_log = self.param(
            "A_log",
            lambda key, shape: jnp.log(
                jax.random.uniform(key, shape, jnp.float32, 1.0, 16.0)
            ),
            (nheads,),
        )
        Dp = self.param("D", nn.initializers.ones, (nheads,))

        # broadcast per-head dt/A/D onto channels -> Mamba-1 scan layout
        dt_c = jnp.repeat(dt, self.headdim, axis=-1)  # (B, L, d_inner)
        A_c = jnp.repeat(-jnp.exp(A_log), self.headdim)[:, None] * jnp.ones(
            (1, N), jnp.float32
        )  # (d_inner, N), rows equal within a head
        D_c = jnp.repeat(Dp, self.headdim)

        scan = selective_scan_pallas if self.use_pallas else selective_scan
        y = scan(xs, dt_c, A_c, Bm, Cm, D_c)
        # gated RMSNorm (mamba2 RMSNormGated): rmsnorm(y * silu(z)) * scale
        y = y * jax.nn.silu(z)
        scale = self.param("norm_scale", nn.initializers.ones, (d_inner,))
        var = jnp.mean(jnp.square(y.astype(jnp.float32)), axis=-1, keepdims=True)
        y = (y * jax.lax.rsqrt(var + 1e-5)).astype(y.dtype) * scale
        return nn.Dense(self.d_model, use_bias=False, name="out_proj")(y)


class PNBiMambaEncoder(nn.Module):
    """Pre-norm bidirectional Mamba encoder with a shared mixer."""

    d_model: int
    d_state: int = 16
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        x_norm = nn.LayerNorm(name="norm1")(x)
        mixer = MambaMixer(
            self.d_model, self.d_state, use_pallas=self.use_pallas, name="mamba"
        )
        # the mixer weights are shared between directions, and every op in it
        # is batch-independent: run both directions as ONE doubled-batch call
        # (bigger matmuls, one scan-kernel launch instead of two)
        stacked = jnp.concatenate([x_norm, jnp.flip(x_norm, axis=1)], axis=0)
        out = mixer(stacked)
        fwd, bwd = jnp.split(out, 2, axis=0)
        h = nn.LayerNorm(name="norm2")(fwd + jnp.flip(bwd, axis=1))
        h = nn.Dense(self.d_model * 4, name="ff1")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.d_model, name="ff2")(h)
        return h + residual

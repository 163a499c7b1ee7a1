"""Conformer encoder block (Gulati et al. 2020), lucidrains-style layout.

The reference's Conformer variants consume `ConformerBlock(dim, dim_head,
heads, ff_mult, conv_expansion_factor, conv_kernel_size)` from a module that
ships missing (`/root/reference/models/official/fake_mamba_model.py:7-8,13-33`).
This is the standard block those call signatures describe: half-step FFN ->
MHSA -> convolution module (pointwise-GLU -> depthwise -> BN -> swish ->
pointwise) -> half-step FFN -> LayerNorm, all pre-norm residual.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConformerFFN(nn.Module):
    dim: int
    mult: int = 4
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train=False):
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.dim * self.mult)(h)
        h = jax.nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.dim)(h)
        return nn.Dropout(self.dropout, deterministic=not train)(h)


class ConformerConvModule(nn.Module):
    dim: int
    expansion: int = 2
    kernel_size: int = 16
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train=False, freeze_bn=False):
        h = nn.LayerNorm()(x)
        inner = self.dim * self.expansion
        h = nn.Dense(inner * 2, name="pw1")(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)  # GLU
        # depthwise conv over time, 'same' padding
        pad = (self.kernel_size - 1) // 2
        h = nn.Conv(
            inner, (self.kernel_size,),
            padding=((pad, self.kernel_size - 1 - pad),),
            feature_group_count=inner, name="depthwise",
        )(h)
        h = nn.BatchNorm(use_running_average=(not train) or freeze_bn, name="bn")(h)
        h = jax.nn.silu(h)
        h = nn.Dense(self.dim, name="pw2")(h)
        return nn.Dropout(self.dropout, deterministic=not train)(h)


class ConformerBlock(nn.Module):
    dim: int
    heads: int = 4
    ff_mult: int = 4
    conv_expansion_factor: int = 2
    conv_kernel_size: int = 16
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train=False, freeze_bn=False):
        x = x + 0.5 * ConformerFFN(self.dim, self.ff_mult, self.dropout, name="ff1")(x, train)
        h = nn.LayerNorm(name="attn_norm")(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads,
            qkv_features=self.dim,
            dropout_rate=self.dropout,
            deterministic=not train,
            name="attn",
        )(h, h)
        x = x + h
        x = x + ConformerConvModule(
            self.dim, self.conv_expansion_factor, self.conv_kernel_size,
            self.dropout, name="conv",
        )(x, train, freeze_bn)
        x = x + 0.5 * ConformerFFN(self.dim, self.ff_mult, self.dropout, name="ff2")(x, train)
        return nn.LayerNorm(name="final_norm")(x)

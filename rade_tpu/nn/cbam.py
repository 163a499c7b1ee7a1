"""CBAM attention over stacked SSL layer features.

Pattern source: the reference zoo's `CBAMAttention`
(`/root/reference/models/official/fake_mamba_model.py:1166-1230`) and its use
in `XLSX_CBAM_SLS_Model` (`:1232-1295`): the (B, L_layers, T, D) stack of all
SSL hidden states is reweighted by channel attention (shared MLP over global
avg+max pooling) then spatial attention (7x7 conv over the (T, L) map of
channel-pooled features), and finally summed over the layer axis.

Exposed in :class:`rade_tpu.nn.wavlm.WavLMFrontend` as ``weighting="cbam"``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class CBAMAttention(nn.Module):
    """Channel + spatial attention on a (B, L, T, D) layer-feature stack."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        B, L, T, D = x.shape
        hidden = max(1, D // self.reduction)
        fc1 = nn.Dense(hidden, use_bias=False, name="channel_fc1")
        fc2 = nn.Dense(D, use_bias=False, name="channel_fc2")

        # channel attention: shared MLP over global avg- and max-pooled D-vecs
        flat = x.reshape(B, L * T, D)
        avg = jnp.mean(flat, axis=1)
        mx = jnp.max(flat, axis=1)
        ca = jax.nn.sigmoid(
            fc2(jax.nn.relu(fc1(avg))) + fc2(jax.nn.relu(fc1(mx)))
        )  # (B, D)
        x = x * ca[:, None, None, :]

        # spatial attention: 7x7 conv over the (T, L) map of the
        # channel-avg/max pooled features.  The map is oriented (T, L) — time
        # as conv rows, layers as columns — matching the reference's permute
        # to [B, C, seq, layers] (`fake_mamba_model.py:1214-1222`) so a torch
        # CBAM `spatial_conv` kernel imports without transposition.
        avg_sp = jnp.mean(x, axis=3)  # (B, L, T)
        max_sp = jnp.max(x, axis=3)
        pooled = jnp.stack([avg_sp, max_sp], axis=-1)  # (B, L, T, 2)
        pooled = pooled.transpose(0, 2, 1, 3)  # (B, T, L, 2) as NHWC
        sa = nn.Conv(
            1, (7, 7), padding=((3, 3), (3, 3)), use_bias=False,
            name="spatial_conv",
        )(pooled)
        sa = jax.nn.sigmoid(sa)  # (B, T, L, 1)
        return x * sa.transpose(0, 2, 1, 3)

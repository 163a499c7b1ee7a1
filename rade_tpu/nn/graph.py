"""Spectro-temporal graph attention layers (AASIST family).

TPU-native ports of `/root/reference/models/AASIST.py:17-322`:

- :class:`GraphAttentionLayer` — pairwise-multiplicative attention over a
  fully-connected node graph (O(N²·D) einsum; N ≤ 29 here, so it's tiny and
  fuses into a couple of MXU calls).
- :class:`HtrgGraphAttentionLayer` — heterogeneous two-type graph attention
  with a master node and per-block-type attention weights.
- :class:`GraphPool` — score-gated top-k node pooling (static k).

All shapes are static; `top_k` and `take_along_axis` compile to TPU-friendly
sorts/gathers.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_xavier = nn.initializers.xavier_normal()


def _batch_norm_nodes(x: jax.Array, train: bool, name: str, freeze_bn: bool = False) -> jax.Array:
    """BatchNorm over flattened (B*N, D) node features, as the reference does."""
    b, n, d = x.shape
    flat = x.reshape(b * n, d)
    flat = nn.BatchNorm(use_running_average=(not train) or freeze_bn, name=name)(flat)
    return flat.reshape(b, n, d)


class GraphAttentionLayer(nn.Module):
    out_dim: int
    temperature: float = 1.0
    input_dropout: float = 0.2

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, freeze_bn: bool = False) -> jax.Array:
        # x: (B, N, D_in)
        x = nn.Dropout(self.input_dropout, deterministic=not train)(x)

        # attention map from pairwise node products
        pair = x[:, :, None, :] * x[:, None, :, :]  # (B, N, N, D_in)
        att = jnp.tanh(nn.Dense(self.out_dim, name="att_proj")(pair))
        att_weight = self.param("att_weight", _xavier, (self.out_dim, 1))
        att = (att @ att_weight) / self.temperature  # (B, N, N, 1)
        att = jax.nn.softmax(att, axis=-2)

        # project: attention-weighted mix + skip
        mixed = jnp.einsum("bij,bjd->bid", att[..., 0], x)
        out = nn.Dense(self.out_dim, name="proj_with_att")(mixed) + nn.Dense(
            self.out_dim, name="proj_without_att"
        )(x)
        out = _batch_norm_nodes(out, train, "bn", freeze_bn)
        return jax.nn.selu(out)


class HtrgGraphAttentionLayer(nn.Module):
    """Heterogeneous (spectral/temporal) graph attention with a master node."""

    in_dim: int
    out_dim: int
    temperature: float = 1.0
    input_dropout: float = 0.2

    @nn.compact
    def __call__(
        self,
        x1: jax.Array,
        x2: jax.Array,
        master: Optional[jax.Array] = None,
        train: bool = False,
        freeze_bn: bool = False,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        n1, n2 = x1.shape[1], x2.shape[1]
        x1 = nn.Dense(self.in_dim, name="proj_type1")(x1)
        x2 = nn.Dense(self.in_dim, name="proj_type2")(x2)
        x = jnp.concatenate([x1, x2], axis=1)  # (B, N1+N2, D)
        if master is None:
            master = jnp.mean(x, axis=1, keepdims=True)

        x = nn.Dropout(self.input_dropout, deterministic=not train)(x)

        # --- type-blocked attention map ---
        pair = x[:, :, None, :] * x[:, None, :, :]
        att = jnp.tanh(nn.Dense(self.out_dim, name="att_proj")(pair))  # (B,N,N,out)
        w11 = self.param("att_weight11", _xavier, (self.out_dim, 1))
        w22 = self.param("att_weight22", _xavier, (self.out_dim, 1))
        w12 = self.param("att_weight12", _xavier, (self.out_dim, 1))
        # per-(i,j) weight vector selected by which type block the edge is in
        n = n1 + n2
        is1 = jnp.arange(n) < n1
        block11 = is1[:, None] & is1[None, :]
        block22 = (~is1[:, None]) & (~is1[None, :])
        w_sel = jnp.where(
            block11[:, :, None], w11[None, None, :, 0],
            jnp.where(block22[:, :, None], w22[None, None, :, 0], w12[None, None, :, 0]),
        )  # (N, N, out)
        att_board = jnp.einsum("bijd,ijd->bij", att, w_sel)[..., None]
        att_board = jax.nn.softmax(att_board / self.temperature, axis=-2)

        # --- master update (directional edges to master) ---
        att_m = jnp.tanh(nn.Dense(self.out_dim, name="att_projM")(x * master))
        w_m = self.param("att_weightM", _xavier, (self.out_dim, 1))
        att_m = jax.nn.softmax((att_m @ w_m) / self.temperature, axis=-2)  # (B,N,1)
        master_mix = jnp.einsum("bn,bnd->bd", att_m[..., 0], x)[:, None, :]
        master = nn.Dense(self.out_dim, name="proj_with_attM")(master_mix) + nn.Dense(
            self.out_dim, name="proj_without_attM"
        )(master)

        # --- node projection ---
        mixed = jnp.einsum("bij,bjd->bid", att_board[..., 0], x)
        out = nn.Dense(self.out_dim, name="proj_with_att")(mixed) + nn.Dense(
            self.out_dim, name="proj_without_att"
        )(x)
        out = _batch_norm_nodes(out, train, "bn", freeze_bn)
        out = jax.nn.selu(out)
        return out[:, :n1], out[:, n1:], master


class GraphPool(nn.Module):
    """Top-k node pooling gated by a learned sigmoid score."""

    k: float
    dropout: float = 0.3

    @nn.compact
    def __call__(self, h: jax.Array, train: bool = False) -> jax.Array:
        n_nodes = h.shape[1]
        n_keep = max(int(n_nodes * self.k), 1)
        z = nn.Dropout(self.dropout, deterministic=not train)(h)
        scores = jax.nn.sigmoid(nn.Dense(1, name="proj")(z))  # (B, N, 1)
        gated = h * scores
        _, idx = jax.lax.top_k(scores[..., 0], n_keep)  # (B, n_keep), descending
        return jnp.take_along_axis(gated, idx[..., None], axis=1)

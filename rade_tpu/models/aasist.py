"""AASIST / AASIST-L: spectro-temporal heterogeneous graph attention model.

TPU-native Flax port of `/root/reference/models/AASIST.py:469-607` (config
`config/AASIST.conf`; AASIST-L is the same module with smaller dims).  Forward
contract matches the reference: ``(waveform (B, T), freq_aug) -> (last_hidden
(B, 5*gat_dim), logits (B, 2))``.

Faithfulness notes:
- The reference expands learnable master nodes but passes the raw (1,1,D)
  parameters into the first heterogeneous layers (`AASIST.py:556-561,573`);
  broadcasting makes that equivalent, and we do the same.
- `Residual_block`'s dead bn1 pre-activation is dropped (see nn/blocks.py).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rade_tpu.nn.blocks import ResBlock2D
from rade_tpu.nn.graph import GraphAttentionLayer, GraphPool, HtrgGraphAttentionLayer
from rade_tpu.nn.sinc import SincConv


class AASIST(nn.Module):
    """d_args mirror of the reference model_config (filts/gat_dims/...)."""

    filts: Sequence = (70, (1, 32), (32, 32), (32, 64), (64, 64))
    gat_dims: Sequence[int] = (64, 32)
    pool_ratios: Sequence[float] = (0.5, 0.7, 0.5, 0.5)
    temperatures: Sequence[float] = (2.0, 2.0, 100.0, 100.0)
    first_conv: int = 128  # sinc kernel size

    @classmethod
    def from_config(cls, model_config: Dict[str, Any]) -> "AASIST":
        return cls(
            filts=tuple(
                tuple(f) if isinstance(f, (list, tuple)) else f
                for f in model_config.get("filts", cls.filts)
            ),
            gat_dims=tuple(model_config.get("gat_dims", cls.gat_dims)),
            pool_ratios=tuple(model_config.get("pool_ratios", cls.pool_ratios)),
            temperatures=tuple(model_config.get("temperatures", cls.temperatures)),
            first_conv=int(model_config.get("first_conv", cls.first_conv)),
        )

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, freq_aug: bool = False,
        freeze_bn: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        filts = self.filts
        gat_dims = self.gat_dims
        pr = self.pool_ratios
        temps = self.temperatures

        # --- sinc frontend -> (B, H=n_filt, W=T', C=1) image ---
        e = SincConv(out_channels=filts[0], kernel_size=self.first_conv, name="conv_time")(
            x, freq_aug=freq_aug
        )  # (B, F, T')
        e = jnp.abs(e)[..., None]  # NHWC with H=F, W=T', C=1
        e = nn.max_pool(e, window_shape=(3, 3), strides=(3, 3))
        e = nn.BatchNorm(use_running_average=(not train) or freeze_bn, name="first_bn")(e)
        e = jax.nn.selu(e)

        # --- 6-block residual encoder ---
        specs = [filts[1], filts[2], filts[3], filts[4], filts[4], filts[4]]
        for i, (c_in, c_out) in enumerate(specs):
            e = ResBlock2D(c_in, c_out, first=(i == 0), name=f"encoder_{i}")(e, train, freeze_bn)
        # e: (B, H=spec, W=time, C)

        # --- spectral / temporal node sets (max-|.| readouts) ---
        e_abs = jnp.abs(e)
        e_s = jnp.max(e_abs, axis=2)  # (B, H, C): max over time
        n_spec = e_s.shape[1]
        pos_s = self.param(
            "pos_S", nn.initializers.normal(1.0), (1, n_spec, filts[-1][-1])
        )
        e_s = e_s + pos_s
        e_t = jnp.max(e_abs, axis=1)  # (B, W, C): max over freq

        gat_s = GraphAttentionLayer(gat_dims[0], temps[0], name="GAT_layer_S")(e_s, train, freeze_bn)
        out_s = GraphPool(pr[0], name="pool_S")(gat_s, train)
        gat_t = GraphAttentionLayer(gat_dims[0], temps[1], name="GAT_layer_T")(e_t, train, freeze_bn)
        out_t = GraphPool(pr[1], name="pool_T")(gat_t, train)

        master1 = self.param("master1", nn.initializers.normal(1.0), (1, 1, gat_dims[0]))
        master2 = self.param("master2", nn.initializers.normal(1.0), (1, 1, gat_dims[0]))

        def branch(out_t0, out_s0, master, l1, l2, ps, pt):
            t1, s1, m1 = l1(out_t0, out_s0, master, train, freeze_bn)
            s1 = ps(s1, train)
            t1 = pt(t1, train)
            t_aug, s_aug, m_aug = l2(t1, s1, m1, train, freeze_bn)
            return t1 + t_aug, s1 + s_aug, m1 + m_aug

        ht11 = HtrgGraphAttentionLayer(gat_dims[0], gat_dims[1], temps[2], name="HtrgGAT_layer_ST11")
        ht12 = HtrgGraphAttentionLayer(gat_dims[1], gat_dims[1], temps[2], name="HtrgGAT_layer_ST12")
        ht21 = HtrgGraphAttentionLayer(gat_dims[0], gat_dims[1], temps[2], name="HtrgGAT_layer_ST21")
        ht22 = HtrgGraphAttentionLayer(gat_dims[1], gat_dims[1], temps[2], name="HtrgGAT_layer_ST22")
        pool_hs1 = GraphPool(pr[2], name="pool_hS1")
        pool_ht1 = GraphPool(pr[2], name="pool_hT1")
        pool_hs2 = GraphPool(pr[2], name="pool_hS2")
        pool_ht2 = GraphPool(pr[2], name="pool_hT2")

        out_t1, out_s1, m1 = branch(out_t, out_s, master1, ht11, ht12, pool_hs1, pool_ht1)
        out_t2, out_s2, m2 = branch(out_t, out_s, master2, ht21, ht22, pool_hs2, pool_ht2)

        drop_way = nn.Dropout(0.2, deterministic=not train)
        out_t1, out_t2 = drop_way(out_t1), drop_way(out_t2)
        out_s1, out_s2 = drop_way(out_s1), drop_way(out_s2)
        m1, m2 = drop_way(m1), drop_way(m2)

        out_tm = jnp.maximum(out_t1, out_t2)
        out_sm = jnp.maximum(out_s1, out_s2)
        master = jnp.maximum(m1, m2)

        t_max = jnp.max(jnp.abs(out_tm), axis=1)
        t_avg = jnp.mean(out_tm, axis=1)
        s_max = jnp.max(jnp.abs(out_sm), axis=1)
        s_avg = jnp.mean(out_sm, axis=1)
        last_hidden = jnp.concatenate(
            [t_max, t_avg, s_max, s_avg, master[:, 0]], axis=1
        )
        last_hidden = nn.Dropout(0.5, deterministic=not train)(last_hidden)
        logits = nn.Dense(2, name="out_layer")(last_hidden)
        return last_hidden, logits

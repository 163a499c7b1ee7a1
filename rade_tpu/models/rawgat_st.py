"""RawGAT-ST: spectro-temporal graph attention baseline.

TPU-native Flax port of `/root/reference/models/RawNetGatSpoofST.py:281-356`
(config `config/RawGATST_baseline.conf`): sinc frontend -> two parallel 2-D
residual encoders (spectral / temporal) -> GAT + top-k pool per branch ->
linear projections to 12 nodes -> elementwise-mul ST fusion -> GAT-ST ->
pool -> 1-d projection -> 2-way output.  Returns ``(proj_ST, logits)``.

The reference hardcodes proj input widths (14/23) for nb_samp=64600
(`RawNetGatSpoofST.py:319-320`); here they derive from the actual node counts
so any static input length works.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rade_tpu.nn.blocks import ResBlock2D
from rade_tpu.nn.graph import GraphAttentionLayer, GraphPool
from rade_tpu.nn.sinc import SincConv


class RawGATST(nn.Module):
    filts: Sequence = (70, (1, 32), (32, 32), (32, 64), (64, 64))
    first_conv: int = 128

    @classmethod
    def from_config(cls, model_config: Dict[str, Any]) -> "RawGATST":
        return cls(
            filts=tuple(
                tuple(f) if isinstance(f, (list, tuple)) else f
                for f in model_config.get("filts", cls.filts)
            ),
            first_conv=int(model_config.get("first_conv", cls.first_conv)),
        )

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, freq_aug: bool = False,
        freeze_bn: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        filts = self.filts
        e = SincConv(out_channels=filts[0], kernel_size=self.first_conv, name="conv_time")(
            x, freq_aug=freq_aug
        )
        e = jnp.abs(e)[..., None]  # (B, H=F, W=T', C=1)
        e = nn.max_pool(e, window_shape=(3, 3), strides=(3, 3))
        e = nn.BatchNorm(use_running_average=(not train) or freeze_bn, name="first_bn")(e)
        e = jax.nn.selu(e)

        specs = [filts[1], filts[2], filts[3], filts[4], filts[4], filts[4]]

        def encode(h, prefix):
            for i, (c_in, c_out) in enumerate(specs):
                h = ResBlock2D(c_in, c_out, first=(i == 0), name=f"{prefix}_{i}")(h, train, freeze_bn)
            return h

        # temporal branch: max-|.| over time -> nodes = spectral bins
        e_t = encode(e, "encoder_T")
        nodes_t = jnp.max(jnp.abs(e_t), axis=2)  # (B, H, C)
        gat_t = GraphAttentionLayer(32, name="GAT_layer_T")(nodes_t, train, freeze_bn)
        pool_t = GraphPool(0.64, name="pool_T")(gat_t, train)
        out_t = nn.Dense(12, name="proj_T")(pool_t.transpose(0, 2, 1))  # (B, 32, 12)

        # spectral branch: max-|.| over freq -> nodes = time frames
        e_s = encode(e, "encoder_S")
        nodes_s = jnp.max(jnp.abs(e_s), axis=1)  # (B, W, C)
        gat_s = GraphAttentionLayer(32, name="GAT_layer_S")(nodes_s, train, freeze_bn)
        pool_s = GraphPool(0.81, name="pool_S")(gat_s, train)
        out_s = nn.Dense(12, name="proj_S")(pool_s.transpose(0, 2, 1))  # (B, 32, 12)

        # ST fusion: elementwise mul, then a third GAT over 12 nodes
        st = (out_t * out_s).transpose(0, 2, 1)  # (B, 12, 32)
        gat_st = GraphAttentionLayer(16, name="GAT_layer_ST")(st, train, freeze_bn)
        pool_st = GraphPool(0.64, name="pool_ST")(gat_st, train)
        proj_st = nn.Dense(1, name="proj_ST")(pool_st)[..., 0]  # (B, nodes)
        logits = nn.Dense(2, name="out_layer")(proj_st)
        return proj_st, logits

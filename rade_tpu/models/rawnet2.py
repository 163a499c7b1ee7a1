"""RawNet2 anti-spoofing baseline.

TPU-native Flax port of `/root/reference/models/RawNet2Spoof.py` (config
`config/RawNet2_baseline.conf`): fixed sinc bank (kernel 1024+1) -> |.| ->
maxpool(3) -> BN/SELU -> six 1-D residual blocks each followed by an FC
squeeze-attention (``x*a + a``) -> BN/SELU -> 3-layer GRU(1024) -> FC(1024) ->
FC(2) -> log-softmax.  Returns ``(last_hidden, log_probs)``.

Faithfulness notes: the reference's 1-D Residual_block has the same dead
bn1 pre-activation as AASIST's (conv1 consumes raw x, `RawNet2Spoof.py:147-155`);
block2/3 filter bookkeeping mutates d_args so blocks 3-5 are (128,128)
(`RawNet2Spoof.py:189`).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rade_tpu.nn.sinc import SincConv


class ResBlock1D(nn.Module):
    """conv(3) -> BN -> LeakyReLU(0.3) -> conv(3) -> (+identity/1x1) -> maxpool(3).

    Input/output ``(B, T, C)`` (channels-last for TPU).
    """

    in_ch: int
    out_ch: int
    first: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, freeze_bn: bool = False) -> jax.Array:
        identity = x
        out = nn.Conv(self.out_ch, (3,), padding=((1, 1),), name="conv1")(x)
        out = nn.BatchNorm(use_running_average=(not train) or freeze_bn, name="bn2")(out)
        out = nn.leaky_relu(out, negative_slope=0.3)
        out = nn.Conv(self.out_ch, (3,), padding=((1, 1),), name="conv2")(out)
        if self.in_ch != self.out_ch:
            identity = nn.Conv(self.out_ch, (1,), padding="VALID", name="conv_downsample")(identity)
        out = out + identity
        return nn.max_pool(out, window_shape=(3,), strides=(3,))


class RawNet2(nn.Module):
    filts: Sequence = (20, (20, 20), (20, 128), (128, 128))
    first_conv: int = 1024
    gru_node: int = 1024
    nb_gru_layer: int = 3
    nb_fc_node: int = 1024
    nb_classes: int = 2

    @classmethod
    def from_config(cls, model_config: Dict[str, Any]) -> "RawNet2":
        return cls(
            filts=tuple(
                tuple(f) if isinstance(f, (list, tuple)) else f
                for f in model_config.get("filts", cls.filts)
            ),
            first_conv=int(model_config.get("first_conv", cls.first_conv)),
            gru_node=int(model_config.get("gru_node", cls.gru_node)),
            nb_gru_layer=int(model_config.get("nb_gru_layer", cls.nb_gru_layer)),
            nb_fc_node=int(model_config.get("nb_fc_node", cls.nb_fc_node)),
            nb_classes=int(model_config.get("nb_classes", cls.nb_classes)),
        )

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, freq_aug: bool = False,
        freeze_bn: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        del freq_aug  # RawNet2 has no frequency masking in the reference
        filts = self.filts
        e = SincConv(out_channels=filts[0], kernel_size=self.first_conv, name="Sinc_conv")(x)
        e = jnp.abs(e).transpose(0, 2, 1)  # (B, T', C) channels-last
        e = nn.max_pool(e, window_shape=(3,), strides=(3,))
        e = nn.BatchNorm(use_running_average=(not train) or freeze_bn, name="first_bn")(e)
        e = jax.nn.selu(e)

        # block channel plan: 2x filts[1], then filts[2], then 3x (filts[2][1], filts[2][1])
        plans = [
            (filts[1][0], filts[1][1], True),
            (filts[1][0], filts[1][1], False),
            (filts[2][0], filts[2][1], False),
            (filts[2][1], filts[2][1], False),
            (filts[2][1], filts[2][1], False),
            (filts[2][1], filts[2][1], False),
        ]
        for i, (c_in, c_out, first) in enumerate(plans):
            e = ResBlock1D(c_in, c_out, first, name=f"block{i}")(e, train, freeze_bn)
            # FC attention over global-avg-pooled features: x = x*a + a
            a = jnp.mean(e, axis=1)  # (B, C)
            a = nn.Dense(c_out, name=f"fc_attention{i}")(a)
            a = jax.nn.sigmoid(a)[:, None, :]  # (B, 1, C)
            e = e * a + a

        e = nn.BatchNorm(use_running_average=(not train) or freeze_bn, name="bn_before_gru")(e)
        e = jax.nn.selu(e)

        # 3-layer GRU, batch_first; take the last time step.  nn.RNN shares
        # its scope with the cell, so naming the CELL pins the param path
        # to gru_{layer}/...
        h = e
        for layer in range(self.nb_gru_layer):
            rnn = nn.RNN(nn.GRUCell(features=self.gru_node, name=f"gru_{layer}"))
            h = rnn(h)
        h_last = h[:, -1, :]
        last_hidden = nn.Dense(self.nb_fc_node, name="fc1_gru")(h_last)
        logits = nn.Dense(self.nb_classes, name="fc2_gru")(last_hidden)
        return last_hidden, jax.nn.log_softmax(logits, axis=-1)

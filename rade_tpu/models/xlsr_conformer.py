"""XLSR-Conformer: SSL frontend + Conformer encoder + attention pooling.

TPU-native port of the reference's `XLSR_Conformer`
(`/root/reference/models/official/fake_mamba_model.py:306-360`): SSL features
-> Linear(1024 -> emb) -> BatchNorm2d(1)+SELU -> N ConformerBlocks ->
attention pooling -> classifier.  The SSL stage is our WavLM encoder (fairseq
XLSR unavailable).  Returns ``(features, logits)``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rade_tpu.nn.conformer import ConformerBlock
from rade_tpu.nn.wavlm import WavLMConfig, WavLMModel


class XLSRConformer(nn.Module):
    emb_size: int = 144
    num_encoders: int = 12
    heads: int = 4
    ff_mult: int = 4
    conv_expansion_factor: int = 2
    conv_kernel_size: int = 16
    wavlm_cfg: WavLMConfig = dataclasses.field(default_factory=WavLMConfig.large)

    @classmethod
    def from_config(cls, model_config: Dict[str, Any]) -> "XLSRConformer":
        # default: faithful XLS-R 300m (plain-MHA wav2vec2 layout), like the
        # reference's fairseq SSL stage (`fake_mamba_model.py:36-109`)
        variant = model_config.get(
            "ssl_variant", model_config.get("wavlm_variant", "xlsr300m")
        )
        wcfg = {"large": WavLMConfig.large, "base": WavLMConfig.base,
                "tiny": WavLMConfig.tiny, "xlsr300m": WavLMConfig.xlsr300m,
                "xlsr_tiny": WavLMConfig.xlsr_tiny}[variant](
            remat=bool(model_config.get("wavlm_remat", True)),
            flash_attention=bool(model_config.get("wavlm_flash_attention", False)),
            sequence_parallel=bool(
                model_config.get("wavlm_sequence_parallel", False)
            ),
        )
        return cls(
            emb_size=int(model_config.get("emb_size", 144)),
            num_encoders=int(model_config.get("num_encoders", 12)),
            heads=int(model_config.get("heads", 4)),
            ff_mult=int(model_config.get("ff_mult", 4)),
            conv_expansion_factor=int(model_config.get("conv_expansion_factor", 2)),
            conv_kernel_size=int(model_config.get("conv_kernel_size", 16)),
            wavlm_cfg=wcfg,
        )

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, freq_aug: bool = False,
        freeze_bn: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        del freq_aug
        ssl_feat, _ = WavLMModel(self.wavlm_cfg, name="ssl_model")(x, train)
        h = nn.Dense(self.emb_size, name="LL_in")(ssl_feat)
        bn = nn.BatchNorm(
            use_running_average=(not train) or freeze_bn, name="first_bn"
        )
        h = bn(h.reshape(h.shape[0], -1, 1)).reshape(h.shape)
        h = jax.nn.selu(h)

        for i in range(self.num_encoders):
            h = ConformerBlock(
                self.emb_size, self.heads, self.ff_mult,
                self.conv_expansion_factor, self.conv_kernel_size,
                name=f"block_{i}",
            )(h, train, freeze_bn)

        w = jax.nn.softmax(nn.Dense(1, name="attention_pool")(h), axis=1)
        features = jnp.sum(w * h, axis=1)
        logits = nn.Dense(2, name="fc5")(features)
        return features, logits

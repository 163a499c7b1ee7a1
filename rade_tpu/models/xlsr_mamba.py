"""XLSR-Mamba: SSL frontend + bidirectional (separate-stack) Mamba mixer.

TPU-native port of `/root/reference/models/official/xlsr_mamba_model.py` +
`mamba_blocks.py:253-411` (MixerModel): SSL features -> Linear(1024 -> emb)
-> BatchNorm2d(1)+SELU -> dual independent Mamba stacks (forward / time-
flipped backward, RMSNorm pre-norm residual blocks), per-direction final
RMSNorm, per-direction attention pooling, concat -> Linear -> dropout ->
classifier.

SSL frontend: by default the faithful XLS-R 300m layout — a wav2vec2-style
encoder (plain MHA, no WavLM bias gating; `WavLMConfig.xlsr300m`), matching
the reference's fairseq ``xlsr2_300m.pt`` (`xlsr_mamba_model.py:18-43`);
import weights with `rade_tpu.nn.wavlm_convert.load_xlsr_checkpoint`.  Set
``ssl_variant`` to 'large'/'base' for a WavLM frontend instead.  Returns
``(features, logits)`` per the framework contract (the reference returns
logits only).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rade_tpu.nn.mamba import MambaMixer
from rade_tpu.nn.wavlm import WavLMConfig, WavLMModel


class RMSNorm(nn.Module):
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.epsilon) * scale).astype(x.dtype)


class MambaStack(nn.Module):
    """mamba_ssm-style residual stack: res = h (+res); h = mixer(RMSNorm(res))."""

    d_model: int
    n_layer: int
    d_state: int = 16

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        residual = None
        for i in range(self.n_layer):
            residual = h if residual is None else h + residual
            normed = RMSNorm(name=f"norm_{i}")(residual)
            h = MambaMixer(self.d_model, self.d_state, name=f"mamba_{i}")(normed)
        return h if residual is None else h + residual


class XLSRMamba(nn.Module):
    emb_size: int = 144
    num_encoders: int = 12  # total; n_layer = // 2 per direction
    d_state: int = 16
    wavlm_cfg: WavLMConfig = dataclasses.field(default_factory=WavLMConfig.large)

    @classmethod
    def from_config(cls, model_config: Dict[str, Any]) -> "XLSRMamba":
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
            d_state=int(model_config.get("d_state", 16)),
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
        # BatchNorm2d(1) over (B,1,T,emb): single-channel whole-tensor BN
        bn = nn.BatchNorm(
            use_running_average=(not train) or freeze_bn, name="first_bn"
        )
        h = bn(h.reshape(h.shape[0], -1, 1)).reshape(h.shape)
        h = jax.nn.selu(h)
        h = nn.Dropout(0.1, deterministic=not train)(h)

        n_layer = max(1, self.num_encoders // 2)
        f = MambaStack(self.emb_size, n_layer, self.d_state, name="forward_layers")(h)
        b = MambaStack(self.emb_size, n_layer, self.d_state, name="backward_layers")(
            jnp.flip(h, axis=1)
        )
        norm_f = RMSNorm(name="norm_f")
        f, b = norm_f(f), norm_f(b)

        f_w = jax.nn.softmax(nn.Dense(1, name="f_attention_pool")(f), axis=1)
        f_pool = jnp.sum(f_w * f, axis=1)
        b_w = jax.nn.softmax(nn.Dense(1, name="b_attention_pool")(b), axis=1)
        b_pool = jnp.sum(b_w * b, axis=1)

        features = nn.Dense(self.emb_size, name="LL")(
            jnp.concatenate([f_pool, b_pool], axis=-1)
        )
        features = nn.Dropout(0.1, deterministic=not train)(features)
        logits = nn.Dense(2, name="classifier")(features)
        return features, logits

"""MoEMambaASV — the archived Phase-3 model (WavLM ± SincNet, MoE-Mamba backend).

TPU-native Flax port of
`/root/reference/legacy_archives/phase3_moe/models/MoEMambaASV.py:460-590`
(config `src/config/MoEMambaASV.conf`): WavLM frontend (+ optional SincNet
stream with sigmoid gated fusion and min-T truncation alignment), BN+SELU
preprocessing, and a bidirectional [Mamba block -> Switch-MoE] stack with
per-direction attention pooling, concat -> Linear.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rade_tpu.nn.mamba import MambaMixer
from rade_tpu.nn.moe import StackedSwitchMoE, SwitchMoE
from rade_tpu.nn.wavlm import WavLMConfig, WavLMFrontend
from .dual_stream_se_mamba import SincNetEncoder


class MoEMixerStack(nn.Module):
    """One direction: [pre-norm Mamba block -> MoE with residual injection] x N.

    `mamba_ssm.Block` semantics: residual = h (+prev residual); h = mixer(LN(residual));
    MoE output is added into the residual stream (`MoEMambaASV.py:425-437`).
    """

    d_model: int
    n_layer: int
    num_experts: int
    top_k: int
    d_state: int = 16
    stacked_experts: bool = False  # expert-parallel layout (parallel/tp.py)

    @nn.compact
    def __call__(self, h: jax.Array, train: bool = False) -> jax.Array:
        residual = None
        for i in range(self.n_layer):
            residual = h if residual is None else h + residual
            normed = nn.LayerNorm(name=f"norm_{i}")(residual)
            h = MambaMixer(self.d_model, self.d_state, name=f"mamba_{i}")(normed)
            curr = h + residual
            moe_cls = StackedSwitchMoE if self.stacked_experts else SwitchMoE
            moe_out = moe_cls(
                self.d_model, self.d_model * 4, self.num_experts, self.top_k,
                name=f"moe_{i}",
            )(curr, train)
            residual = residual + moe_out
        return h if residual is None else h + residual


class MoEMambaASV(nn.Module):
    emb_size: int = 144
    num_encoders: int = 6  # total across both directions (n_layer = //2)
    num_experts: int = 4
    top_k: int = 2
    use_sinc_stream: bool = False
    sinc_channels: int = 70
    stacked_experts: bool = False
    wavlm_cfg: WavLMConfig = dataclasses.field(default_factory=WavLMConfig.large)

    @classmethod
    def from_config(cls, model_config: Dict[str, Any]) -> "MoEMambaASV":
        variant = model_config.get("wavlm_variant", "large")
        wcfg = {"large": WavLMConfig.large, "base": WavLMConfig.base,
                "tiny": WavLMConfig.tiny}[variant](
            remat=bool(model_config.get("wavlm_remat", True)),
            flash_attention=bool(model_config.get("wavlm_flash_attention", False)),
            fused_gated_attention=bool(
                model_config.get("wavlm_fused_gated_attention", False)
            ),
            sequence_parallel=bool(
                model_config.get("wavlm_sequence_parallel", False)
            ),
        )
        return cls(
            emb_size=int(model_config.get("emb_size", 144)),
            num_encoders=int(model_config.get("num_encoders", 6)),
            num_experts=int(model_config.get("num_experts", 4)),
            top_k=int(model_config.get("top_k", 2)),
            use_sinc_stream=bool(model_config.get("use_sinc_stream", False)),
            sinc_channels=int(model_config.get("sinc_channels", 70)),
            stacked_experts=bool(model_config.get("moe_stacked_experts", False)),
            wavlm_cfg=wcfg,
        )

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, freq_aug: bool = False,
        freeze_bn: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        f_wavlm = WavLMFrontend(self.wavlm_cfg, name="wavlm_stream")(x, train)
        f_wavlm = nn.Dense(self.emb_size, name="wavlm_proj")(f_wavlm)

        if self.use_sinc_stream:
            f_sinc = SincNetEncoder(self.sinc_channels, name="sinc_model")(
                x, train, freq_aug, freeze_bn
            )
            f_sinc = nn.Dense(self.emb_size, name="sinc_proj")(f_sinc)
            # min-T truncation alignment + sigmoid gated convex fusion
            t = min(f_wavlm.shape[1], f_sinc.shape[1])
            f_w, f_s = f_wavlm[:, :t], f_sinc[:, :t]
            g = nn.Dense(self.emb_size, name="fusion_gate_fc1")(
                jnp.concatenate([f_w, f_s], axis=-1)
            )
            g = jax.nn.relu(g)
            g = jax.nn.sigmoid(nn.Dense(self.emb_size, name="fusion_gate_fc2")(g))
            h = nn.LayerNorm(name="fusion_norm")(g * f_w + (1.0 - g) * f_s)
        else:
            h = f_wavlm

        # the reference's preprocessing is BatchNorm2d(1) over (B,1,T,emb):
        # a single mean/var/scale/bias across the whole tensor
        bn = nn.BatchNorm(
            use_running_average=(not train) or freeze_bn, name="first_bn"
        )
        h = bn(h.reshape(h.shape[0], -1, 1)).reshape(h.shape)
        h = jax.nn.selu(h)

        n_layer = max(1, self.num_encoders // 2)
        f_states = MoEMixerStack(
            self.emb_size, n_layer, self.num_experts, self.top_k,
            stacked_experts=self.stacked_experts, name="backbone_forward",
        )(nn.Dropout(0.1, deterministic=not train)(h), train)
        b_states = MoEMixerStack(
            self.emb_size, n_layer, self.num_experts, self.top_k,
            stacked_experts=self.stacked_experts, name="backbone_backward",
        )(nn.Dropout(0.1, deterministic=not train)(jnp.flip(h, axis=1)), train)

        norm_f = nn.LayerNorm(name="norm_f")
        f_states = norm_f(f_states)
        b_states = norm_f(b_states)

        f_w = jax.nn.softmax(nn.Dense(1, name="f_attention_pool")(f_states), axis=1)
        f_pool = jnp.sum(f_w * f_states, axis=1)
        b_w = jax.nn.softmax(nn.Dense(1, name="b_attention_pool")(b_states), axis=1)
        b_pool = jnp.sum(b_w * b_states, axis=1)
        combined = nn.Dense(self.emb_size, name="LL")(
            jnp.concatenate([f_pool, b_pool], axis=-1)
        )
        features = nn.Dropout(0.1, deterministic=not train)(combined)
        logits = nn.Dense(2, name="classifier")(features)
        return features, logits



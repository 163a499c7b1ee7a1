"""The remaining Fake-Mamba experiment zoo, every class constructible.

The reference vendors ~18 experiment models in
`/root/reference/models/official/fake_mamba_model.py` but ships the file
unimportable (`:7-8` imports a `conformer00`/`conformer` module that does not
exist in the repo).  `rade_tpu/models/xlsr_zoo.py` carried XLSR_Transformer,
XLSR_AASIST and XLSX_SLS_Mamba2; this module carries EVERY remaining
top-level model class as a registry entry:

| Registry name          | Reference class (file:line)                      |
|------------------------|--------------------------------------------------|
| FakeMamba              | `Fake_Mamba` (`:110-170`)                        |
| XLSRAttWConformer      | `XLSR_AttW_Conformer` (`:361-440`)               |
| MLXLSRConformer        | `ML_XLSR_Conformer` (`:443-508`)                 |
| MLMamba                | `ML_MambaModel` (`:599-720`)                     |
| MLXLSXBiMambaFFNSLS    | `ML_XLSX_BiMamba_FFN_SLS_Model` (`:722-843`)     |
| MLXLSX10BiMambaFFN     | `ML_XLSX_10_BiMamba_FFN_Model` (`:845-931`)      |
| MLXLSXBiMambaFFN       | `ML_XLSX_BiMamba_FFN_Model` (`:934-1020`)        |
| XLSXSLSMamba           | `XLSX_SLS_Mamba_Model` (`:1055-1160`)            |
| XLSXCBAMSLS            | `XLSX_CBAM_SLS_Model` (`:1231-1295`)             |
| MLCBAMMamba            | `ML_CBAM_MambaModel` (`:1297-1369`)              |
| XLSXSLSAttMamba        | `XLSX_SLS_att_Mamba_Model` (`:1371-1487`)        |
| XLSXSLSDualMamba       | `XLSX_SLS_Dual_Mamba_Model` (`:1489-1594`)       |
| XLSXMamba1             | `XLSX_Mamba1_Model` (`:1847-1895`, the LIVE def —|
|                        | the `:1705` definition is shadowed by it)        |

Missing-module reconstructions (documented per class below):

- ``BiMambas(dim, depth)`` — pre-norm bidirectional shared-mixer Mamba
  stack WITHOUT the FFN sub-layer (the `_FFN` suffix marks the FFN variant,
  which is exactly the flagship's `PN_BiMambas_Encoder`,
  `src/models/DualStreamSEMamba.py:445-486`).
- ``JustBiMamba(encoder_dim, ...)`` — pre-norm bidirectional Mamba-1 blocks
  operating at the SSL width (1024), sequence-in/sequence-out.  The "Dual"
  variant uses SEPARATE per-direction mixers (the non-dual one shares the
  mixer across directions, like `PN_BiMambas_Encoder`).  The conformer-era
  `num_attention_heads`/`conv_kernel_size` args are accepted and ignored,
  as no conformer sublayers appear in any surviving call site.
- ``ConBiMamba`` — conformer sandwich with the MHSA sub-layer replaced by a
  bidirectional Mamba mixer (half-FFN -> BiMamba -> conv module -> half-FFN
  -> LayerNorm), then attention pooling and a `num_classes`-way head.

All models return ``(features, logits)`` per the framework contract; where
the reference emits log-softmax "logits" (the SLS heads), the log-softmax is
preserved — monotone in the score channel, and it reproduces the reference's
training quirk exactly (same as the RawNet2 port).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rade_tpu.models.xlsr_zoo import _ssl_cfg, _whole_tensor_bn
from rade_tpu.nn.cbam import CBAMAttention
from rade_tpu.nn.conformer import ConformerBlock, ConformerConvModule, ConformerFFN
from rade_tpu.nn.mamba import MambaMixer, PNBiMambaEncoder
from rade_tpu.nn.wavlm import WavLMConfig, WavLMModel


# ---------------------------------------------------------------------------
# shared sub-modules
# ---------------------------------------------------------------------------


class SLSFusion(nn.Module):
    """getAttenF + sigmoid gate (`fake_mamba_model.py:557-580,634-646`).

    Per-layer time-mean summaries -> Dense(1) ("fc0") -> sigmoid -> weighted
    sum of the (B, L_layers, T, E) stack over the layer axis.
    """

    @nn.compact
    def __call__(self, layer_stack: jax.Array) -> jax.Array:
        pooled = jnp.mean(layer_stack, axis=2)  # (B, L, E)
        w = jax.nn.sigmoid(nn.Dense(1, name="fc0")(pooled))  # (B, L, 1)
        return jnp.sum(layer_stack * w[:, :, :, None], axis=1)  # (B, T, E)


class BiMambaNoFFN(nn.Module):
    """`BiMambas` block reconstruction: PN bidirectional mixer, no FFN."""

    d_model: int
    d_state: int = 16
    shared: bool = True

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        h = nn.LayerNorm(name="norm1")(x)
        if self.shared:
            mixer = MambaMixer(self.d_model, self.d_state, name="mamba")
            stacked = jnp.concatenate([h, jnp.flip(h, axis=1)], axis=0)
            out = mixer(stacked)
            fwd, bwd = jnp.split(out, 2, axis=0)
        else:
            fwd = MambaMixer(self.d_model, self.d_state, name="mamba_fwd")(h)
            bwd = MambaMixer(self.d_model, self.d_state, name="mamba_bwd")(
                jnp.flip(h, axis=1)
            )
        h = nn.LayerNorm(name="norm2")(fwd + jnp.flip(bwd, axis=1))
        return h + residual


def _bimamba_stack(h, depth, d_model, d_state=16, ffn=True, shared=True):
    for i in range(max(1, depth)):
        if ffn:
            h = PNBiMambaEncoder(d_model, d_state, name=f"encoder_{i}")(h)
        else:
            h = BiMambaNoFFN(d_model, d_state, shared=shared, name=f"encoder_{i}")(h)
    return h


class ConBiMambaBlock(nn.Module):
    """`ConBiMamba` reconstruction: conformer block, MHSA -> BiMamba."""

    dim: int
    d_state: int = 16
    ff_mult: int = 4
    conv_expansion_factor: int = 2
    conv_kernel_size: int = 16

    @nn.compact
    def __call__(self, x, train=False, freeze_bn=False):
        x = x + 0.5 * ConformerFFN(self.dim, self.ff_mult, name="ff1")(x, train)
        h = nn.LayerNorm(name="mamba_norm")(x)
        mixer = MambaMixer(self.dim, self.d_state, name="bimamba")
        stacked = jnp.concatenate([h, jnp.flip(h, axis=1)], axis=0)
        out = mixer(stacked)
        fwd, bwd = jnp.split(out, 2, axis=0)
        x = x + fwd + jnp.flip(bwd, axis=1)
        x = x + ConformerConvModule(
            self.dim, self.conv_expansion_factor, self.conv_kernel_size,
            name="conv",
        )(x, train, freeze_bn)
        x = x + 0.5 * ConformerFFN(self.dim, self.ff_mult, name="ff2")(x, train)
        return nn.LayerNorm(name="final_norm")(x)


def _attn_pool(h, name="attention_pool"):
    """softmax(Linear(d,1)) time pooling (`fake_mamba_model.py:157-161`)."""
    w = jax.nn.softmax(nn.Dense(1, name=name)(h), axis=1)
    return jnp.sum(w * h, axis=1)


def _sls_head(h, train, freeze_bn, log_softmax=False):
    """XLSR-SLS classifier head (`fake_mamba_model.py:1113-1156`).

    (B, T, E) as a 1-channel image -> whole-tensor BN -> SELU ->
    maxpool(3,3) -> flatten -> fc1(->1024) -> SELU -> fc3(->2) -> SELU
    [-> log-softmax].  Returns (features=fc1 output, logits).
    """
    img = _whole_tensor_bn(h, train, freeze_bn, name="first_bn")
    img = jax.nn.selu(img)[..., None]
    img = nn.max_pool(img, window_shape=(3, 3), strides=(3, 3))
    flat = img.reshape(img.shape[0], -1)
    feat = jax.nn.selu(nn.Dense(1024, name="fc1")(flat))
    logits = jax.nn.selu(nn.Dense(2, name="fc3")(feat))
    if log_softmax:
        logits = jax.nn.log_softmax(logits, axis=-1)
    return feat, logits


_SSL_DEFAULT = dataclasses.field(default_factory=WavLMConfig.xlsr300m)


def _common_fields(model_config: Dict[str, Any]) -> Dict[str, Any]:
    return {
        "emb_size": int(model_config.get("emb_size", 144)),
        "wavlm_cfg": _ssl_cfg(model_config),
    }


# ---------------------------------------------------------------------------
# models
# ---------------------------------------------------------------------------


class FakeMamba(nn.Module):
    """`Fake_Mamba` (`fake_mamba_model.py:110-170`): SSL -> LL -> BN/SELU ->
    PN_BiMambas(depth 7, with FFN) -> attention pool -> fc5."""

    emb_size: int = 144
    depth: int = 7
    d_state: int = 16
    wavlm_cfg: WavLMConfig = _SSL_DEFAULT

    @classmethod
    def from_config(cls, model_config: Dict[str, Any]) -> "FakeMamba":
        return cls(
            depth=int(model_config.get("num_encoders", 7)),
            d_state=int(model_config.get("d_state", 16)),
            **_common_fields(model_config),
        )

    @nn.compact
    def __call__(
        self, x, train: bool = False, freq_aug: bool = False,
        freeze_bn: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        del freq_aug
        ssl_feat, _ = WavLMModel(self.wavlm_cfg, name="ssl_model")(x, train)
        h = nn.Dense(self.emb_size, name="LL")(ssl_feat)
        h = jax.nn.selu(_whole_tensor_bn(h, train, freeze_bn))
        h = _bimamba_stack(h, self.depth, self.emb_size, self.d_state, ffn=True)
        features = _attn_pool(h)
        return features, nn.Dense(2, name="fc5")(features)


class XLSRAttWConformer(nn.Module):
    """`XLSR_AttW_Conformer` (`:361-440`): SLS layer fusion -> LL -> BN/SELU
    -> 4x ConformerBlock(dim_head=dim/heads) -> attention pool -> fc5."""

    emb_size: int = 144
    depth: int = 4
    heads: int = 4
    conv_kernel_size: int = 16
    wavlm_cfg: WavLMConfig = _SSL_DEFAULT

    @classmethod
    def from_config(cls, model_config: Dict[str, Any]) -> "XLSRAttWConformer":
        return cls(
            depth=int(model_config.get("num_encoders", 4)),
            heads=int(model_config.get("heads", 4)),
            conv_kernel_size=int(model_config.get("kernel_size", 16)),
            **_common_fields(model_config),
        )

    @nn.compact
    def __call__(
        self, x, train: bool = False, freq_aug: bool = False,
        freeze_bn: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        del freq_aug
        _, hidden = WavLMModel(self.wavlm_cfg, name="ssl_model")(x, train)
        fused = SLSFusion(name="sls")(jnp.stack(hidden[1:], axis=1))
        h = nn.Dense(self.emb_size, name="LL")(fused)
        h = jax.nn.selu(_whole_tensor_bn(h, train, freeze_bn))
        for i in range(self.depth):
            h = ConformerBlock(
                self.emb_size, self.heads,
                conv_kernel_size=self.conv_kernel_size, name=f"encoder_{i}",
            )(h, train, freeze_bn)
        features = _attn_pool(h)
        return features, nn.Dense(2, name="fc5")(features)


class MLXLSRConformer(nn.Module):
    """`ML_XLSR_Conformer` (`:443-508`): SLS fusion -> LL -> BN/SELU ->
    MyConformer (class token, `fake_mamba_model.py:13-33`): token-0 readout
    -> fc5.  Returns (class-token embedding, logits)."""

    emb_size: int = 144
    depth: int = 4
    heads: int = 4
    conv_kernel_size: int = 16
    wavlm_cfg: WavLMConfig = _SSL_DEFAULT

    @classmethod
    def from_config(cls, model_config: Dict[str, Any]) -> "MLXLSRConformer":
        return cls(
            depth=int(model_config.get("num_encoders", 4)),
            heads=int(model_config.get("heads", 4)),
            conv_kernel_size=int(model_config.get("kernel_size", 16)),
            **_common_fields(model_config),
        )

    @nn.compact
    def __call__(
        self, x, train: bool = False, freq_aug: bool = False,
        freeze_bn: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        del freq_aug
        _, hidden = WavLMModel(self.wavlm_cfg, name="ssl_model")(x, train)
        fused = SLSFusion(name="sls")(jnp.stack(hidden[1:], axis=1))
        h = nn.Dense(self.emb_size, name="LL")(fused)
        h = jax.nn.selu(_whole_tensor_bn(h, train, freeze_bn))
        # MyConformer: prepend a learnable class token per utterance
        tok = self.param(
            "class_token", nn.initializers.uniform(1.0), (1, self.emb_size)
        )
        h = jnp.concatenate(
            [jnp.broadcast_to(tok, (h.shape[0], 1, self.emb_size)), h], axis=1
        )
        for i in range(self.depth):
            h = ConformerBlock(
                self.emb_size, self.heads,
                conv_kernel_size=self.conv_kernel_size, name=f"encoder_{i}",
            )(h, train, freeze_bn)
        embedding = h[:, 0]
        return embedding, nn.Dense(2, name="fc5")(embedding)


class MLMamba(nn.Module):
    """`ML_MambaModel` (`:599-720`): SLS fusion -> LL -> BN/SELU ->
    BiMambas(depth 12, no FFN) -> attention pool -> fc5."""

    emb_size: int = 144
    depth: int = 12
    d_state: int = 16
    wavlm_cfg: WavLMConfig = _SSL_DEFAULT

    @classmethod
    def from_config(cls, model_config: Dict[str, Any]) -> "MLMamba":
        return cls(
            depth=int(model_config.get("num_encoders", 12)),
            d_state=int(model_config.get("d_state", 16)),
            **_common_fields(model_config),
        )

    @nn.compact
    def __call__(
        self, x, train: bool = False, freq_aug: bool = False,
        freeze_bn: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        del freq_aug
        _, hidden = WavLMModel(self.wavlm_cfg, name="ssl_model")(x, train)
        fused = SLSFusion(name="sls")(jnp.stack(hidden[1:], axis=1))
        h = nn.Dense(self.emb_size, name="LL")(fused)
        h = jax.nn.selu(_whole_tensor_bn(h, train, freeze_bn))
        h = _bimamba_stack(h, self.depth, self.emb_size, self.d_state, ffn=False)
        features = _attn_pool(h)
        return features, nn.Dense(2, name="fc5")(features)


class MLXLSXBiMambaFFNSLS(nn.Module):
    """`ML_XLSX_BiMamba_FFN_SLS_Model` (`:722-843`).

    Reference quirk preserved: the SLS weights are COMPUTED but the encoder
    input is `LL(x_ssl_feat)` — the final-layer feature, not the fused stack
    (`:774`).  After BiMambas_FFN, the (T, E) map is BN/SELU'd and
    maxpool(3,3)'d, then attention-pooled at width E//3 and classified with
    a Linear(E//3, 2) (`:745-748,786-810`)."""

    emb_size: int = 144
    depth: int = 12
    d_state: int = 16
    wavlm_cfg: WavLMConfig = _SSL_DEFAULT

    @classmethod
    def from_config(cls, model_config: Dict[str, Any]) -> "MLXLSXBiMambaFFNSLS":
        return cls(
            depth=int(model_config.get("num_encoders", 12)),
            d_state=int(model_config.get("d_state", 16)),
            **_common_fields(model_config),
        )

    @nn.compact
    def __call__(
        self, x, train: bool = False, freq_aug: bool = False,
        freeze_bn: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        del freq_aug
        ssl_feat, hidden = WavLMModel(self.wavlm_cfg, name="ssl_model")(x, train)
        # dead-but-parameterized SLS branch, exactly as the reference computes
        # then drops it (`:755-774`); XLA DCEs the compute, the params remain
        SLSFusion(name="sls")(jnp.stack(hidden[1:], axis=1))
        h = nn.Dense(self.emb_size, name="LL")(ssl_feat)
        h = jax.nn.selu(_whole_tensor_bn(h, train, freeze_bn))
        h = _bimamba_stack(h, self.depth, self.emb_size, self.d_state, ffn=True)
        # SLS-style pooled map, then attention pooling over the E//3 columns
        img = _whole_tensor_bn(h, train, freeze_bn, name="head_bn")
        img = jax.nn.selu(img)[..., None]
        img = nn.max_pool(img, window_shape=(3, 3), strides=(3, 3))[..., 0]
        features = _attn_pool(img)
        return features, nn.Dense(2, name="fc5")(features)


class MLXLSX10BiMambaFFN(nn.Module):
    """`ML_XLSX_10_BiMamba_FFN_Model` (`:845-931`): ONLY transformer layer
    10's output (`getAttenF10`, `:583-596`) -> LL -> BN/SELU ->
    BiMambas_FFN(12) -> attention pool -> fc5."""

    emb_size: int = 144
    depth: int = 12
    d_state: int = 16
    tap_layer: int = 10
    wavlm_cfg: WavLMConfig = _SSL_DEFAULT

    @classmethod
    def from_config(cls, model_config: Dict[str, Any]) -> "MLXLSX10BiMambaFFN":
        return cls(
            depth=int(model_config.get("num_encoders", 12)),
            d_state=int(model_config.get("d_state", 16)),
            tap_layer=int(model_config.get("tap_layer", 10)),
            **_common_fields(model_config),
        )

    @nn.compact
    def __call__(
        self, x, train: bool = False, freq_aug: bool = False,
        freeze_bn: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        del freq_aug
        _, hidden = WavLMModel(self.wavlm_cfg, name="ssl_model")(x, train)
        # hidden[0] is the pre-encoder projection; hidden[k] = layer k output,
        # so the reference's layerResult[9] (10th layer) is hidden[10]
        tap = min(self.tap_layer, len(hidden) - 1)
        h = nn.Dense(self.emb_size, name="LL")(hidden[tap])
        h = jax.nn.selu(_whole_tensor_bn(h, train, freeze_bn))
        h = _bimamba_stack(h, self.depth, self.emb_size, self.d_state, ffn=True)
        features = _attn_pool(h)
        return features, nn.Dense(2, name="fc5")(features)


class MLXLSXBiMambaFFN(nn.Module):
    """`ML_XLSX_BiMamba_FFN_Model` (`:934-1020`): SLS fusion -> LL -> BN/SELU
    -> BiMambas_FFN(depth 4) -> attention pool -> fc5."""

    emb_size: int = 144
    depth: int = 4
    d_state: int = 16
    wavlm_cfg: WavLMConfig = _SSL_DEFAULT

    @classmethod
    def from_config(cls, model_config: Dict[str, Any]) -> "MLXLSXBiMambaFFN":
        return cls(
            depth=int(model_config.get("num_encoders", 4)),
            d_state=int(model_config.get("d_state", 16)),
            **_common_fields(model_config),
        )

    @nn.compact
    def __call__(
        self, x, train: bool = False, freq_aug: bool = False,
        freeze_bn: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        del freq_aug
        _, hidden = WavLMModel(self.wavlm_cfg, name="ssl_model")(x, train)
        fused = SLSFusion(name="sls")(jnp.stack(hidden[1:], axis=1))
        h = nn.Dense(self.emb_size, name="LL")(fused)
        h = jax.nn.selu(_whole_tensor_bn(h, train, freeze_bn))
        h = _bimamba_stack(h, self.depth, self.emb_size, self.d_state, ffn=True)
        features = _attn_pool(h)
        return features, nn.Dense(2, name="fc5")(features)


class _JustBiMambaZoo(nn.Module):
    """Shared body for the `XLSX_SLS_*_Mamba` family: layer fusion ->
    JustBiMamba at the SSL width -> XLSR-SLS head."""

    num_encoders: int = 12
    d_state: int = 16
    fusion: str = "sls"  # "sls" | "cbam"
    dual: bool = False  # separate per-direction mixers
    log_softmax: bool = False
    cbam_reduction: int = 16
    wavlm_cfg: WavLMConfig = _SSL_DEFAULT

    @classmethod
    def from_config(cls, model_config: Dict[str, Any]):
        return cls(
            num_encoders=int(model_config.get("num_encoders", 12)),
            d_state=int(model_config.get("d_state", 16)),
            cbam_reduction=int(model_config.get("cbam_reduction", 16)),
            wavlm_cfg=_ssl_cfg(model_config),
        )

    @nn.compact
    def __call__(
        self, x, train: bool = False, freq_aug: bool = False,
        freeze_bn: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        del freq_aug
        E = self.wavlm_cfg.hidden_size
        _, hidden = WavLMModel(self.wavlm_cfg, name="ssl_model")(x, train)
        stack = jnp.stack(hidden[1:], axis=1)
        if self.fusion == "cbam":
            fused = jnp.sum(
                CBAMAttention(self.cbam_reduction, name="cbam_attention")(stack),
                axis=1,
            )
        else:
            fused = SLSFusion(name="sls")(stack)
        h = _bimamba_stack(
            fused, self.num_encoders, E, self.d_state, ffn=False,
            shared=not self.dual,
        )
        return _sls_head(h, train, freeze_bn, log_softmax=self.log_softmax)


class XLSXSLSMamba(_JustBiMambaZoo):
    """`XLSX_SLS_Mamba_Model` (`:1055-1160`): SLS -> JustBiMamba -> SLS head."""


class XLSXSLSAttMamba(_JustBiMambaZoo):
    """`XLSX_SLS_att_Mamba_Model` (`:1371-1487`): CBAM layer attention
    instead of the sigmoid SLS gate, then JustBiMamba -> SLS head."""

    fusion: str = "cbam"


class XLSXSLSDualMamba(_JustBiMambaZoo):
    """`XLSX_SLS_Dual_Mamba_Model` (`:1489-1594`): as XLSXSLSMamba but the
    missing `JustBiMamba`'s Dual variant is reconstructed with SEPARATE
    forward/backward mixers (the shared-mixer form is the non-dual one)."""

    dual: bool = True


class XLSXCBAMSLS(nn.Module):
    """`XLSX_CBAM_SLS_Model` (`:1231-1295`): CBAM over the layer stack ->
    sum over layers -> XLSR-SLS head -> log-softmax (reference emits
    log-probs as logits; preserved, monotone for scoring)."""

    cbam_reduction: int = 16
    wavlm_cfg: WavLMConfig = _SSL_DEFAULT

    @classmethod
    def from_config(cls, model_config: Dict[str, Any]) -> "XLSXCBAMSLS":
        return cls(
            cbam_reduction=int(model_config.get("cbam_reduction", 16)),
            wavlm_cfg=_ssl_cfg(model_config),
        )

    @nn.compact
    def __call__(
        self, x, train: bool = False, freq_aug: bool = False,
        freeze_bn: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        del freq_aug
        _, hidden = WavLMModel(self.wavlm_cfg, name="ssl_model")(x, train)
        stack = jnp.stack(hidden[1:], axis=1)
        fused = jnp.sum(
            CBAMAttention(self.cbam_reduction, name="cbam_attention")(stack),
            axis=1,
        )
        return _sls_head(fused, train, freeze_bn, log_softmax=True)


class MLCBAMMamba(nn.Module):
    """`ML_CBAM_MambaModel` (`:1297-1369`): CBAM layer fusion -> LL ->
    BN/SELU -> BiMambas(12, no FFN) -> attention pool -> fc5."""

    emb_size: int = 144
    depth: int = 12
    d_state: int = 16
    cbam_reduction: int = 16
    wavlm_cfg: WavLMConfig = _SSL_DEFAULT

    @classmethod
    def from_config(cls, model_config: Dict[str, Any]) -> "MLCBAMMamba":
        return cls(
            depth=int(model_config.get("num_encoders", 12)),
            d_state=int(model_config.get("d_state", 16)),
            cbam_reduction=int(model_config.get("cbam_reduction", 16)),
            **_common_fields(model_config),
        )

    @nn.compact
    def __call__(
        self, x, train: bool = False, freq_aug: bool = False,
        freeze_bn: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        del freq_aug
        _, hidden = WavLMModel(self.wavlm_cfg, name="ssl_model")(x, train)
        stack = jnp.stack(hidden[1:], axis=1)
        fused = jnp.sum(
            CBAMAttention(self.cbam_reduction, name="cbam_attention")(stack),
            axis=1,
        )
        h = nn.Dense(self.emb_size, name="LL")(fused)
        h = jax.nn.selu(_whole_tensor_bn(h, train, freeze_bn))
        h = _bimamba_stack(h, self.depth, self.emb_size, self.d_state, ffn=False)
        features = _attn_pool(h)
        return features, nn.Dense(2, name="fc5")(features)


class XLSXMamba1(nn.Module):
    """`XLSX_Mamba1_Model` (`:1847-1895`, the live definition): SSL final
    feature -> LL(1024 -> emb) -> BN/SELU -> ConBiMamba blocks (conformer
    sandwich with a bidirectional Mamba core; reconstruction of the missing
    `ConBiMamba(num_classes=2, ...)`) -> attention pool -> 2-way head."""

    emb_size: int = 144
    depth: int = 12
    heads: int = 4
    d_state: int = 16
    conv_kernel_size: int = 16
    wavlm_cfg: WavLMConfig = _SSL_DEFAULT

    @classmethod
    def from_config(cls, model_config: Dict[str, Any]) -> "XLSXMamba1":
        return cls(
            depth=int(model_config.get("num_encoders", 12)),
            heads=int(model_config.get("heads", 4)),
            d_state=int(model_config.get("d_state", 16)),
            conv_kernel_size=int(model_config.get("kernel_size", 16)),
            **_common_fields(model_config),
        )

    @nn.compact
    def __call__(
        self, x, train: bool = False, freq_aug: bool = False,
        freeze_bn: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        del freq_aug
        ssl_feat, _ = WavLMModel(self.wavlm_cfg, name="ssl_model")(x, train)
        h = nn.Dense(self.emb_size, name="LL")(ssl_feat)
        h = jax.nn.selu(_whole_tensor_bn(h, train, freeze_bn))
        for i in range(self.depth):
            h = ConBiMambaBlock(
                self.emb_size, self.d_state,
                conv_kernel_size=self.conv_kernel_size, name=f"encoder_{i}",
            )(h, train, freeze_bn)
        features = _attn_pool(h)
        return features, nn.Dense(2, name="fc5")(features)

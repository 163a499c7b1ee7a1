"""DualStreamSEMamba — the Phase 4/5/6 flagship.

TPU-native Flax port of `/root/reference/src/models/DualStreamSEMamba.py:643-769`
(config `src/config/Phase6_Proposed.conf`):

  WavLM-Large stream (25-state learnable weighting)  ─┐
                                                       ├─ LayerNorm/proj/
  SincNet stream (AASIST frontend, temporal readout) ─┘  time-align/concat
  -> fusion proj -> SE -> LN -> dropout
  -> N x pre-norm BiMamba encoders -> LN -> attention pooling -> classifier

Returns ``(features (B, emb), logits (B, 2))``.

Time alignment uses linear interpolation of the SincNet stream onto the WavLM
frame rate (nearest when the ratio exceeds 4x), per `DualStreamSEMamba.py:601-625`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rade_tpu.nn.blocks import ResBlock2D
from rade_tpu.nn.mamba import PNBiMambaEncoder
from rade_tpu.nn.sinc import SincConv
from rade_tpu.nn.wavlm import WavLMConfig, WavLMFrontend


class SincNetEncoder(nn.Module):
    """AASIST frontend only: sinc bank -> res blocks -> temporal max readout.

    (`DualStreamSEMamba.py:206-270`) -> (B, T', 64).
    """

    sinc_channels: int = 70
    sinc_kernel: int = 128
    remat: bool = False  # checkpoint the conv blocks: their (B,H,W,C)
    # activations at full audio rate are the largest tensors in the model

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False, freq_aug: bool = False,
                 freeze_bn: bool = False):
        filts = [self.sinc_channels, (1, 32), (32, 32), (32, 64), (64, 64)]
        e = SincConv(out_channels=filts[0], kernel_size=self.sinc_kernel, name="conv_time")(
            x, freq_aug=freq_aug
        )
        e = jnp.abs(e)[..., None]  # (B, H=F, W=T, C=1)
        e = nn.max_pool(e, window_shape=(3, 3), strides=(3, 3))
        e = nn.BatchNorm(use_running_average=(not train) or freeze_bn, name="first_bn")(e)
        e = jax.nn.selu(e)
        specs = [filts[1], filts[2], filts[3], filts[4], filts[4], filts[4]]
        block_cls = nn.remat(ResBlock2D, static_argnums=(2, 3)) if self.remat else ResBlock2D
        for i, (c_in, c_out) in enumerate(specs):
            e = block_cls(c_in, c_out, first=(i == 0), name=f"encoder_{i}")(e, train, freeze_bn)
        # temporal readout: max |.| over the spectral axis -> (B, T', C)
        return jnp.max(jnp.abs(e), axis=1)

    @property
    def out_dim(self) -> int:
        return 64


def sinc_encoder_fast(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    x: jax.Array,
    sinc_channels: int = 70,
    sinc_kernel: int = 128,
    eps: float = 1e-5,
) -> jax.Array:
    """Eval-mode SincNetEncoder via the packed Pallas res-block chain.

    Pure-function twin of :class:`SincNetEncoder` (same params/batch_stats
    subtrees, taken at the ``sinc_stream`` key) with the six residual blocks
    running as fused Pallas kernels (`kernels/resblock_packed.py`) — the
    XLA path's ~6 HBM passes per block over the (B, 23, ~21k, C) activations
    were ~50% of flagship inference (docs/BENCH_NOTES.md).  No freq-aug, no
    BN updates: scoring only.  Parity test: tests/test_sinc_fast.py.
    """
    from rade_tpu.kernels.resblock_packed import resblock_chain_packed
    from rade_tpu.nn.sinc import sinc_bandpass_bank

    bank = jnp.asarray(
        sinc_bandpass_bank(sinc_channels, sinc_kernel), x.dtype
    )
    e = jax.lax.conv_general_dilated(
        x[:, None, :], bank[:, None, :], (1,), "VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    e = jnp.abs(e)[..., None]  # (B, H=F, W=T, C=1)
    e = nn.max_pool(e, window_shape=(3, 3), strides=(3, 3))
    bn_p, bn_s = params["first_bn"], batch_stats["first_bn"]
    inv = jax.lax.rsqrt(bn_s["var"].astype(jnp.float32) + eps)
    e = (
        (e.astype(jnp.float32) - bn_s["mean"].astype(jnp.float32))
        * inv * bn_p["scale"].astype(jnp.float32)
        + bn_p["bias"].astype(jnp.float32)
    )
    e = jax.nn.selu(e).astype(x.dtype)

    blocks = []
    for i in range(6):
        bp, bs = params[f"encoder_{i}"], batch_stats[f"encoder_{i}"]
        entry = {
            "w1": bp["conv1"]["kernel"], "b1": bp["conv1"]["bias"],
            "bn_scale": bp["bn2"]["scale"], "bn_bias": bp["bn2"]["bias"],
            "bn_mean": bs["bn2"]["mean"], "bn_var": bs["bn2"]["var"],
            "w2": bp["conv2"]["kernel"], "b2": bp["conv2"]["bias"],
        }
        if "conv_downsample" in bp:
            entry["wd"] = bp["conv_downsample"]["kernel"]
            entry["bd"] = bp["conv_downsample"]["bias"]
        blocks.append(entry)
    e = resblock_chain_packed(e, blocks, eps=eps)
    return jnp.max(jnp.abs(e), axis=1)  # (B, T', C)


def sinc_encoder_train_fast(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    x: jax.Array,
    freq_key: jax.Array = None,
    sinc_channels: int = 70,
    sinc_kernel: int = 128,
    mask_max_bands: int = 20,
    eps: float = 1e-5,
    backward: str = "recompute",
) -> jax.Array:
    """Training twin of :func:`sinc_encoder_fast`: differentiable (packed
    Pallas forward + XLA-recompute VJP, `kernels/resblock_grad.py`) and with
    the random filter-band freq-aug mask (`freq_key`; None = no masking).

    ``backward`` selects the chain VJP: "recompute" replays the chain with
    XLA convs (`kernels/resblock_grad.py`), "native" runs the whole block
    backward inside Pallas (`kernels/resblock_packed_vjp.py` — no replay
    buffers in HBM, select-and-scatter/conv-transpose free).

    Valid exactly when the module forward equals its eval-mode function —
    i.e. ``freeze_bn`` (the Phase-6 recipe): BatchNorm pinned to running
    stats, no dropout in the blocks.  The mask draw mirrors
    ``SincConv.__call__`` (`nn/sinc.py:68-80`; the reference's random band
    masking, `models/AASIST.py:391-410` — a fresh draw per forward, which is
    why the FGM adversarial pass needs its own key, `src/main.py:1087`).
    """
    if backward == "native":
        from rade_tpu.kernels.resblock_packed_vjp import (
            chain_packed_native as chain_fn,
        )
    else:
        from rade_tpu.kernels.resblock_grad import (
            chain_packed_trainable as chain_fn,
        )
    from rade_tpu.nn.sinc import sinc_bandpass_bank

    bank = jnp.asarray(sinc_bandpass_bank(sinc_channels, sinc_kernel), x.dtype)
    if freq_key is not None:
        k_a, k_s = jax.random.split(freq_key)
        n_masked = jnp.floor(
            jax.random.uniform(k_a, (), minval=0.0, maxval=float(mask_max_bands))
        ).astype(jnp.int32)
        start = jnp.floor(
            jax.random.uniform(k_s, ())
            * (sinc_channels - n_masked + 1).astype(jnp.float32)
        ).astype(jnp.int32)
        band = jnp.arange(sinc_channels)
        keep = (band < start) | (band >= start + n_masked)
        bank = bank * keep[:, None].astype(bank.dtype)

    # rematted head: its stored residuals (conv out for the |.| sign,
    # pre-pool tensor for the max argmax, ~0.35 GB/pass at the flagship
    # shapes) would otherwise sit in HBM until the pullback; the replay is
    # one cheap sinc conv
    @jax.checkpoint
    def _head(bn_p, x_in, bank_in):
        e = jax.lax.conv_general_dilated(
            x_in[:, None, :], bank_in[:, None, :], (1,), "VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )
        e = jnp.abs(e)[..., None]  # (B, H=F, W=T, C=1)
        e = nn.max_pool(e, window_shape=(3, 3), strides=(3, 3))
        bn_s = batch_stats["first_bn"]
        inv = jax.lax.rsqrt(bn_s["var"].astype(jnp.float32) + eps)
        e = (
            (e.astype(jnp.float32) - bn_s["mean"].astype(jnp.float32))
            * inv * bn_p["scale"].astype(jnp.float32)
            + bn_p["bias"].astype(jnp.float32)
        )
        return jax.nn.selu(e).astype(x_in.dtype)

    e = _head(params["first_bn"], x, bank)

    blocks = []
    for i in range(6):
        bp, bs = params[f"encoder_{i}"], batch_stats[f"encoder_{i}"]
        entry = {
            "w1": bp["conv1"]["kernel"], "b1": bp["conv1"]["bias"],
            "bn_scale": bp["bn2"]["scale"], "bn_bias": bp["bn2"]["bias"],
            "bn_mean": bs["bn2"]["mean"], "bn_var": bs["bn2"]["var"],
            "w2": bp["conv2"]["kernel"], "b2": bp["conv2"]["bias"],
        }
        if "conv_downsample" in bp:
            entry["wd"] = bp["conv_downsample"]["kernel"]
            entry["bd"] = bp["conv_downsample"]["bias"]
        blocks.append(entry)
    e = chain_fn(blocks, e, eps)
    return jnp.max(jnp.abs(e), axis=1)  # (B, T', C)


class SELayer(nn.Module):
    """1-D squeeze-excitation over (B, T, C) (`DualStreamSEMamba.py:492-531`)."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        y = jnp.mean(x, axis=1)  # (B, C)
        y = nn.Dense(self.channels // self.reduction, use_bias=False, name="fc1")(y)
        y = jax.nn.relu(y)
        y = nn.Dense(self.channels, use_bias=False, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, :]


def _time_align(f_s: jax.Array, target_len: int) -> jax.Array:
    """Interpolate (B, T2, C) -> (B, target_len, C).

    torch.F.interpolate semantics: 'linear' with align_corners=False, or
    'nearest' when upscaling by more than 4x.
    """
    src_len = f_s.shape[1]
    if src_len == target_len:
        return f_s
    scale = target_len / src_len
    pos = (jnp.arange(target_len) + 0.5) / scale - 0.5
    if scale > 4.0:
        idx = jnp.clip(jnp.floor((jnp.arange(target_len)) / scale), 0, src_len - 1).astype(jnp.int32)
        return f_s[:, idx, :]
    lo = jnp.clip(jnp.floor(pos), 0, src_len - 1).astype(jnp.int32)
    hi = jnp.clip(lo + 1, 0, src_len - 1)
    w = jnp.clip(pos - lo, 0.0, 1.0)[None, :, None]
    return f_s[:, lo, :] * (1.0 - w) + f_s[:, hi, :] * w


class DualStreamFusion(nn.Module):
    """LN -> proj -> time-align -> concat -> proj -> SE -> LN -> dropout."""

    out_dim: int
    reduction: int = 16

    @nn.compact
    def __call__(self, f_wavlm, f_sinc, train: bool = False):
        f_w = nn.LayerNorm(name="ln_wavlm")(f_wavlm)
        f_s = nn.LayerNorm(name="ln_sinc")(f_sinc)
        f_w = nn.Dense(self.out_dim, name="wavlm_proj")(f_w)
        f_s = nn.Dense(self.out_dim, name="sinc_proj")(f_s)
        f_s = _time_align(f_s, f_w.shape[1])
        fused = nn.Dense(self.out_dim, name="fusion_proj")(
            jnp.concatenate([f_w, f_s], axis=-1)
        )
        fused = SELayer(self.out_dim, self.reduction, name="se_layer")(fused)
        fused = nn.LayerNorm(name="norm")(fused)
        return nn.Dropout(0.1, deterministic=not train)(fused)


class DualStreamSEMamba(nn.Module):
    emb_size: int = 144
    num_encoders: int = 4
    d_state: int = 16
    sinc_channels: int = 70
    se_reduction: int = 16
    wavlm_cfg: WavLMConfig = dataclasses.field(default_factory=WavLMConfig.large)
    use_pallas_scan: bool = False
    wavlm_weighting: str = "softmax"  # or 'sls' per-sample layer attention
    sinc_remat: bool = False

    @classmethod
    def from_config(cls, model_config: Dict[str, Any]) -> "DualStreamSEMamba":
        wavlm_variant = model_config.get("wavlm_variant", "large")
        lora_rank = int(model_config.get("lora_r", 0))
        kw = dict(
            lora_rank=lora_rank,
            lora_alpha=int(model_config.get("lora_alpha", 32)),
            remat=bool(model_config.get("wavlm_remat", True)),
            remat_policy=str(model_config.get("wavlm_remat_policy", "full")),
            scan_layers=bool(model_config.get("wavlm_scan_layers", False)),
            flash_attention=bool(model_config.get("wavlm_flash_attention", False)),
            fused_gated_attention=bool(
                model_config.get("wavlm_fused_gated_attention", False)
            ),
            sequence_parallel=bool(
                model_config.get("wavlm_sequence_parallel", False)
            ),
        )
        if wavlm_variant == "large":
            wcfg = WavLMConfig.large(**kw)
        elif wavlm_variant == "base":
            wcfg = WavLMConfig.base(**kw)
        else:
            wcfg = WavLMConfig.tiny(**kw)
        return cls(
            emb_size=int(model_config.get("emb_size", 144)),
            num_encoders=int(model_config.get("num_encoders", 4)),
            d_state=int(model_config.get("d_state", 16)),
            sinc_channels=int(model_config.get("sinc_channels", 70)),
            se_reduction=int(model_config.get("se_reduction", 16)),
            wavlm_cfg=wcfg,
            # TPU-only kernel (no interpret fallback in selective_scan):
            # gate on backend like wavlm's fused_gated_attention, so any
            # .conf runs unmodified on CPU (the reference's mock-mamba
            # CPU-check pattern, `/root/reference/utils/check_model.py:6-24`)
            use_pallas_scan=bool(model_config.get("use_pallas_scan", False))
            and jax.default_backend() == "tpu",
            wavlm_weighting=str(model_config.get("wavlm_weighting", "softmax")),
            sinc_remat=bool(model_config.get("sinc_remat", False)),
        )

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, freq_aug: bool = False,
        freeze_bn: bool = False, sinc_features: jax.Array = None,
        wavlm_features: jax.Array = None,
        wavlm_extractor_features: jax.Array = None,
    ) -> Tuple[jax.Array, jax.Array]:
        if wavlm_features is not None:
            # precomputed WavLM stream: the pipeline-parallel path computes
            # it functionally outside the module (nn/wavlm_pp.py) because
            # its params live in the stacked pp layout
            f_wavlm = wavlm_features
        else:
            # wavlm_extractor_features: the frozen CNN extractor's output,
            # computed once per micro-batch and shared across the two FGM
            # passes (train/step.py `share_extractor`)
            f_wavlm = WavLMFrontend(
                self.wavlm_cfg, weighting=self.wavlm_weighting, name="wavlm_stream"
            )(x, train, extractor_features=wavlm_extractor_features)
        if sinc_features is not None:
            # precomputed sinc stream (the Pallas fast path computes it
            # outside the module via `sinc_encoder_fast` at scoring time)
            f_sinc = sinc_features
        else:
            f_sinc = SincNetEncoder(
                self.sinc_channels, remat=self.sinc_remat, name="sinc_stream"
            )(x, train, freq_aug, freeze_bn)
        h = DualStreamFusion(self.emb_size, self.se_reduction, name="fusion")(
            f_wavlm, f_sinc, train
        )
        for i in range(self.num_encoders):
            h = PNBiMambaEncoder(
                self.emb_size, self.d_state,
                use_pallas=self.use_pallas_scan, name=f"backbone_{i}",
            )(h)
        h = nn.LayerNorm(name="norm_f")(h)
        attn = jax.nn.softmax(nn.Dense(1, name="attention_pool")(h), axis=1)
        features = jnp.sum(attn * h, axis=1)  # (B, emb)
        features = nn.Dropout(0.1, deterministic=not train)(features)
        logits = nn.Dense(2, name="classifier")(features)
        return features, logits

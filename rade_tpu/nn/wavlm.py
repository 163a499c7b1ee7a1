"""WavLM in Flax: CNN feature encoder, gated relative-position-bias
transformer, 25-hidden-state taps, LoRA hooks.

From-scratch TPU port of the architecture the reference consumes through
`transformers.WavLMModel` (`/root/reference/src/models/DualStreamSEMamba.py:276-439`).
HF ships no Flax WavLM; this implements the same computation (validated
against the local torch `transformers` implementation in tests):

- feature encoder: 7 strided conv1d layers; 'layer' norm variant (LayerNorm
  per conv, conv bias — wavlm-large) and 'group' variant (GroupNorm on layer 0
  — wavlm-base);
- feature projection: LayerNorm -> Linear(conv_dim -> hidden) -> dropout;
- encoder: weight-normed conv positional embedding (kernel 128, 16 groups,
  same-pad with one column removed), then N pre-norm ("stable layer norm")
  transformer layers with WavLM's *gated relative position bias*: a bucketed
  T5-style bias table on layer 0, reused by later layers, gated per
  (batch, head, position) by a sigmoid projection of the pre-attention hidden
  states;
- hidden-state taps: [input-to-layer-0 (post pos-conv), inputs to layers
  1..N-1, final layernormed output] — N+1 states, matching HF's
  `output_hidden_states=True` contract the reference's 25-layer weighting
  relies on.

Differences (documented): torch layerdrop is not applied (the reference
fine-tunes with most layers frozen; layerdrop off is the deterministic
choice); attention-prob dropout uses the flax rng stream.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class WavLMConfig:
    hidden_size: int = 1024
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    intermediate_size: int = 4096
    conv_dim: Sequence[int] = (512,) * 7
    conv_kernel: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    feat_extract_norm: str = "layer"  # 'layer' (large) | 'group' (base)
    conv_bias: bool = True
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    num_buckets: int = 320
    max_bucket_distance: int = 800
    do_stable_layer_norm: bool = True
    layer_norm_eps: float = 1e-5
    hidden_dropout: float = 0.1
    activation_dropout: float = 0.1
    attention_dropout: float = 0.1
    feat_proj_dropout: float = 0.0
    lora_rank: int = 0
    lora_alpha: int = 32
    # 'wavlm' = gated relative-position-bias attention; 'plain' = standard
    # MHA (wav2vec2 / XLS-R family — no bias table, no gate)
    attention_type: str = "wavlm"
    remat: bool = False  # jax.checkpoint each encoder layer
    # rematerialization policy for the layer checkpoint: 'full' recomputes
    # everything in the backward (minimum memory); 'dots' saves matmul
    # outputs (jax.checkpoint_policies.checkpoint_dots) so the backward
    # skips recomputing the MXU work and only replays the cheap
    # elementwise/softmax ops — more activation memory, less recompute time
    remat_policy: str = "full"
    # stack layers 1..N-1 into one nn.scan: ~N-fold smaller traced/compiled
    # graph (WavLM-Large train-step compiles drop from tens of minutes to
    # minutes) at identical math.  Param layout changes: `layers_1..N-1`
    # become one `layers_scan` tree with a leading layer axis (converters in
    # `stack_layer_params` / `unstack_layer_params`).
    scan_layers: bool = False
    # fuse the eval-path attention (Pallas flash kernel, kernels/attention.py):
    # train-path keeps the unfused einsum because the recipe applies attention
    # dropout on the probabilities, which the kernel does not support
    flash_attention: bool = False
    # fuse BOTH paths with the dense gated-attention kernel
    # (kernels/gated_attention.py): exploits the factored WavLM bias
    # (gate x table) so no per-sample (B,H,L,L) tensor ever reaches HBM, and
    # applies attention-probability dropout inside the kernel (TPU hardware
    # PRNG — same substitution class as training_config.fast_rng).  Takes
    # precedence over flash_attention; falls back to the unfused einsum off
    # TPU (CPU meshes / tests)
    fused_gated_attention: bool = False
    # Megatron-style sequence parallelism: constrain the residual stream to
    # be time-sharded over the mesh `model` axis between attention/FFN
    # blocks (rade_tpu/parallel/sp.py).  No-op on meshes without a model
    # axis; pairs with the tensor-parallel weight rules (parallel/tp.py)
    sequence_parallel: bool = False

    @classmethod
    def large(cls, **kw) -> "WavLMConfig":
        return cls(**kw)

    @classmethod
    def base(cls, **kw) -> "WavLMConfig":
        return cls(
            hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
            intermediate_size=3072, feat_extract_norm="group", conv_bias=False,
            do_stable_layer_norm=False, **kw,
        )

    @classmethod
    def tiny(cls, **kw) -> "WavLMConfig":
        """Small config for tests."""
        return cls(
            hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
            intermediate_size=64, conv_dim=(16,) * 3, conv_kernel=(10, 3, 3),
            conv_stride=(5, 2, 2), num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4, num_buckets=40,
            max_bucket_distance=100, **kw,
        )

    @classmethod
    def xlsr300m(cls, **kw) -> "WavLMConfig":
        """wav2vec2 XLS-R 300m (the reference's fairseq ``xlsr2_300m.pt``,
        `/root/reference/models/official/xlsr_mamba_model.py:21-43`): same
        dims as wavlm-large but plain MHA and no bias-table/gating."""
        return cls(attention_type="plain", **kw)

    @classmethod
    def xlsr_tiny(cls, **kw) -> "WavLMConfig":
        """Small plain-attention config for tests."""
        return cls.tiny(attention_type="plain", **kw)


def _sp_shard(cfg: "WavLMConfig", x: jax.Array) -> jax.Array:
    """Sequence-parallel constraint on the residual stream (no-op unless
    cfg.sequence_parallel and a model-axis mesh is active)."""
    if not cfg.sequence_parallel:
        return x
    from rade_tpu.parallel.sp import shard_seq

    return shard_seq(x)


def relative_position_buckets(
    q_len: int, k_len: int, num_buckets: int, max_distance: int
) -> np.ndarray:
    """T5-style log-bucketed relative positions (static; computed in numpy)."""
    context = np.arange(q_len)[:, None]
    memory = np.arange(k_len)[None, :]
    rel = memory - context
    nb = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * nb
    rel = np.abs(rel)
    max_exact = nb // 2
    is_small = rel < max_exact
    rel_large = (
        max_exact
        + (
            np.log(np.maximum(rel, 1).astype(np.float64) / max_exact)
            / math.log(max_distance / max_exact)
            * (nb - max_exact)
        )
    ).astype(np.int64)
    rel_large = np.minimum(rel_large, nb - 1)
    buckets += np.where(is_small, rel, rel_large)
    return buckets



def _remat_policy(name: str):
    """Map WavLMConfig.remat_policy to a jax.checkpoint policy (None =
    recompute everything, the jax.checkpoint default)."""
    if name == "dots":
        return jax.checkpoint_policies.checkpoint_dots
    if name == "dots_no_batch":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if name in ("full", "", None):
        return None
    raise ValueError(f"unknown remat_policy {name!r} (full | dots | dots_no_batch)")

class WavLMAttention(nn.Module):
    cfg: WavLMConfig
    has_relative_position_bias: bool

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        position_bias: Optional[jax.Array],
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        cfg = self.cfg
        bsz, L, E = x.shape
        H = cfg.num_attention_heads
        hd = E // H
        plain = cfg.attention_type == "plain"

        if position_bias is None and not plain:
            buckets = relative_position_buckets(
                L, L, cfg.num_buckets, cfg.max_bucket_distance
            )
            table = self.param(
                "rel_attn_embed",
                nn.initializers.normal(0.02),
                (cfg.num_buckets, H),
            )
            position_bias = table[jnp.asarray(buckets)].transpose(2, 0, 1)  # (H, L, L)

        use_fused_gated = (
            cfg.fused_gated_attention
            and not plain
            and jax.default_backend() == "tpu"
        )
        if not plain:
            # gated relative position bias from the pre-projection hiddens
            gated = x.reshape(bsz, L, H, hd).transpose(0, 2, 1, 3)  # (B,H,L,hd)
            rel_proj = nn.Dense(8, name="gru_rel_pos_linear")(gated)
            rel_proj = rel_proj.reshape(bsz, H, L, 2, 4).sum(-1)
            gate_a, gate_b = jnp.split(jax.nn.sigmoid(rel_proj), 2, axis=-1)
            gru_const = self.param(
                "gru_rel_pos_const", nn.initializers.ones, (1, H, 1, 1)
            )
            gate = gate_a * (gate_b * gru_const - 1.0) + 2.0  # (B, H, L, 1)
            if not use_fused_gated:
                gated_bias = gate * position_bias[None]  # (B, H, L, L)

        def proj(name: str, inp):
            y = nn.Dense(E, name=name)(inp)
            if cfg.lora_rank > 0 and name in ("q_proj", "v_proj"):
                # LoRA adapter: y += (x @ A) @ B * alpha/r (B zero-init)
                a = self.param(
                    f"lora_A_{name}",
                    nn.initializers.he_uniform(),
                    (E, cfg.lora_rank),
                )
                b = self.param(
                    f"lora_B_{name}", nn.initializers.zeros, (cfg.lora_rank, E)
                )
                y = y + (inp @ a) @ b * (cfg.lora_alpha / cfg.lora_rank)
            return y

        q = proj("q_proj", x) * (hd**-0.5)
        k = proj("k_proj", x)
        v = proj("v_proj", x)
        q = q.reshape(bsz, L, H, hd).transpose(0, 2, 1, 3)
        k = k.reshape(bsz, L, H, hd).transpose(0, 2, 1, 3)
        v = v.reshape(bsz, L, H, hd).transpose(0, 2, 1, 3)

        if use_fused_gated:
            from rade_tpu.kernels.gated_attention import gated_attention

            dropout_p = float(cfg.attention_dropout)
            if train and dropout_p > 0.0:
                seed = jax.random.bits(
                    self.make_rng("dropout"), (), jnp.uint32
                )
            else:
                seed = jnp.uint32(0)
            out = gated_attention(
                q, k, v, gate, position_bias, seed, dropout_p, train
            )
        elif cfg.flash_attention and not train:
            from rade_tpu.kernels.attention import fused_bias_attention

            out = fused_bias_attention(q, k, v, None if plain else gated_bias)
        else:
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k)
            if not plain:
                logits = logits + gated_bias
            probs = jax.nn.softmax(logits, axis=-1)
            probs = nn.Dropout(cfg.attention_dropout, deterministic=not train)(probs)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(bsz, L, E)
        out = nn.Dense(E, name="out_proj")(out)
        return out, position_bias


class WavLMFeedForward(nn.Module):
    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        cfg = self.cfg
        x = nn.Dense(cfg.intermediate_size, name="intermediate_dense")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dropout(cfg.activation_dropout, deterministic=not train)(x)
        x = nn.Dense(cfg.hidden_size, name="output_dense")(x)
        x = nn.Dropout(cfg.hidden_dropout, deterministic=not train)(x)
        return x


class WavLMEncoderLayer(nn.Module):
    """Stable-layer-norm (pre-norm) and post-norm variants in one module."""

    cfg: WavLMConfig
    has_relative_position_bias: bool

    @nn.compact
    def __call__(self, x, position_bias, train: bool = False):
        cfg = self.cfg
        attn = WavLMAttention(
            cfg, self.has_relative_position_bias, name="attention"
        )
        if cfg.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm")(x)
            h, position_bias = attn(h, position_bias, train)
            h = nn.Dropout(cfg.hidden_dropout, deterministic=not train)(h)
            x = x + h
            x = x + WavLMFeedForward(cfg, name="feed_forward")(
                nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="final_layer_norm")(x),
                train,
            )
        else:
            h, position_bias = attn(x, position_bias, train)
            h = nn.Dropout(cfg.hidden_dropout, deterministic=not train)(h)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm")(x + h)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="final_layer_norm")(
                x + WavLMFeedForward(cfg, name="feed_forward")(x, train)
            )
        return x, position_bias


class WavLMFeatureEncoder(nn.Module):
    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        h = x[..., None]  # (B, T, 1)
        for i, (dim, k, s) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            h = nn.Conv(
                dim, (k,), strides=(s,), padding="VALID",
                use_bias=cfg.conv_bias, name=f"conv_layers_{i}_conv",
            )(h)
            if cfg.feat_extract_norm == "layer":
                h = nn.LayerNorm(name=f"conv_layers_{i}_layer_norm")(h)
            elif i == 0:  # 'group': GroupNorm(num_groups=C) on layer 0 only
                h = nn.GroupNorm(
                    num_groups=cfg.conv_dim[0], name="conv_layers_0_layer_norm"
                )(h)
            h = jax.nn.gelu(h, approximate=False)
        return h  # (B, T', conv_dim[-1])


class WavLMPositionalConvEmbedding(nn.Module):
    cfg: WavLMConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        cfg = self.cfg
        k = cfg.num_conv_pos_embeddings
        h = nn.Conv(
            cfg.hidden_size, (k,), padding=((k // 2, k // 2),),
            feature_group_count=cfg.num_conv_pos_embedding_groups, name="conv",
        )(x)
        if k % 2 == 0:  # SamePadLayer: drop the trailing column for even kernels
            h = h[:, :-1, :]
        return jax.nn.gelu(h, approximate=False)


class _ScanLayerBody(nn.Module):
    """nn.scan body: one encoder layer (no position-bias table), emitting its
    output both as the carry and as a per-layer tap."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(self, h, position_bias, train):
        layer_cls = WavLMEncoderLayer
        if self.cfg.remat:
            layer_cls = nn.remat(
                WavLMEncoderLayer, static_argnums=(3,),
                policy=_remat_policy(self.cfg.remat_policy),
            )
        h, _ = layer_cls(self.cfg, has_relative_position_bias=False, name="layer")(
            h, position_bias, train
        )
        h = _sp_shard(self.cfg, h)
        return h, h


class WavLMModel(nn.Module):
    """Returns (last_hidden_state, tuple of num_layers+1 hidden states)."""

    cfg: WavLMConfig

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, extractor_features=None
    ):
        cfg = self.cfg
        if extractor_features is not None:
            # precomputed CNN-extractor output: the extractor is
            # deterministic (convs + norms + GELU, no dropout) and frozen in
            # every supported recipe, so the FGM train step computes it ONCE
            # and feeds both passes (train/step.py `share_extractor`).  Only
            # valid on apply() with an existing param tree — init never
            # takes this path, so the `feature_extractor` params are always
            # created.
            feats = extractor_features
        else:
            feats = WavLMFeatureEncoder(cfg, name="feature_extractor")(x)
        h = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, name="feature_projection_layer_norm"
        )(feats)
        h = nn.Dense(cfg.hidden_size, name="feature_projection")(h)
        h = nn.Dropout(cfg.feat_proj_dropout, deterministic=not train)(h)

        pos = WavLMPositionalConvEmbedding(cfg, name="pos_conv_embed")(h)
        h = h + pos
        if not cfg.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="encoder_layer_norm")(h)
        h = nn.Dropout(cfg.hidden_dropout, deterministic=not train)(h)
        h = _sp_shard(cfg, h)

        hidden_states = [h]
        position_bias = None
        layer_cls = WavLMEncoderLayer
        if cfg.remat:
            layer_cls = nn.remat(
                WavLMEncoderLayer, static_argnums=(3,),
                policy=_remat_policy(cfg.remat_policy),
            )
        if cfg.scan_layers and cfg.num_hidden_layers > 1:
            # layer 0 owns the relative-position-bias table; layers 1..N-1
            # are structurally identical and run as ONE nn.scan over stacked
            # params, emitting every per-layer hidden state
            layer0 = layer_cls(cfg, has_relative_position_bias=True, name="layers_0")
            h, position_bias = layer0(h, position_bias, train)
            h = _sp_shard(cfg, h)
            hidden_states.append(h)
            scanned = nn.scan(
                _ScanLayerBody,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast, nn.broadcast),
                length=cfg.num_hidden_layers - 1,
            )(cfg, name="layers_scan")
            h, per_layer = scanned(h, position_bias, train)
            # per_layer[k] = output of layer k+1; all but the last are taps
            hidden_states.extend(
                per_layer[k] for k in range(cfg.num_hidden_layers - 2)
            )
        else:
            for i in range(cfg.num_hidden_layers):
                layer = layer_cls(
                    cfg, has_relative_position_bias=(i == 0), name=f"layers_{i}"
                )
                h, position_bias = layer(h, position_bias, train)
                h = _sp_shard(cfg, h)
                if i < cfg.num_hidden_layers - 1:
                    hidden_states.append(h)
        if cfg.do_stable_layer_norm:
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="encoder_layer_norm")(h)
        hidden_states.append(h)
        return h, tuple(hidden_states)


class WavLMFrontend(nn.Module):
    """WavLM with learnable softmax weighting over all hidden states.

    Mirrors the reference `WavLMFrontend` (`DualStreamSEMamba.py:276-439`):
    all N+1 hidden states, softmax-weighted sum with a learnable weight vector.
    Freezing policy (CNN+projection always; bottom-K transformer layers; -1 =
    full fine-tune) is applied via optimizer masks — see
    :func:`wavlm_frozen_paths`.
    """

    cfg: WavLMConfig
    weighting: str = "softmax"  # 'softmax' (global learnable) | 'sls' (per-sample)

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, extractor_features=None
    ) -> jax.Array:
        _, hidden = WavLMModel(self.cfg, name="model")(
            x, train, extractor_features=extractor_features
        )
        stack = jnp.stack(hidden, axis=0)  # (N+1, B, T, E)
        if self.weighting == "cbam":
            # CBAM pattern (reference `fake_mamba_model.py:1166-1295`):
            # channel+spatial attention on the layer stack, then layer-sum
            from rade_tpu.nn.cbam import CBAMAttention

            weighted = CBAMAttention(name="cbam")(stack.transpose(1, 0, 2, 3))
            return jnp.sum(weighted, axis=1)
        if self.weighting == "sls":
            # SLS pattern (reference `fake_mamba_model.py:286-302` getAttenF):
            # per-sample attention over layer outputs from time-pooled summaries
            pooled = jnp.mean(stack, axis=2)  # (L, B, E)
            scores = nn.Dense(1, name="layer_attention")(pooled)[..., 0]  # (L, B)
            w = jax.nn.softmax(scores, axis=0)
            return jnp.einsum("lb,lbte->bte", w, stack)
        weights = self.param(
            "layer_weights",
            nn.initializers.ones,
            (len(hidden),),
        )
        w = jax.nn.softmax(weights)
        return jnp.einsum("l,lbte->bte", w, stack)

    @property
    def out_dim(self) -> int:
        return self.cfg.hidden_size


def wavlm_frozen_paths(freeze_layers: int, num_layers: int = 24, use_lora: bool = False):
    """Path substrings to freeze, for `make_trainable_mask`.

    - CNN extractor + feature projection: always frozen (reference policy);
      note FGM unfreezes feature_projection separately when targeted.
    - `freeze_layers` = K >= 0: freeze encoder layers [0, K); -1 = none.
    - LoRA: freeze ALL base WavLM params; only lora_* (and layer_weights,
      which live outside these paths) train.
    """
    if use_lora:
        # freeze everything under the inner model except LoRA adapters —
        # the mask fn treats 'lora_' paths as always trainable
        return ("wavlm_stream/model",)
    frozen = ["feature_extractor", "feature_projection"]
    if freeze_layers is not None and freeze_layers >= 0:
        frozen += [f"layers_{i}/" for i in range(min(freeze_layers, num_layers))]
    return tuple(frozen)


# ---------------------------------------------------------------------------
# scan-layout <-> unrolled-layout parameter conversion (WavLMModel subtree)
# ---------------------------------------------------------------------------


def _is_unrolled_layer_key(key: str) -> bool:
    return key.startswith("layers_") and key not in ("layers_0", "layers_scan")


def stack_layer_params(model_params, num_layers: int):
    """Unrolled WavLMModel params (`layers_1..N-1`) -> scan layout
    (`layers_scan/layer` with a leading layer axis).  `layers_0` and all
    non-encoder subtrees pass through unchanged."""
    out = {k: v for k, v in model_params.items() if not _is_unrolled_layer_key(k)}
    per = [model_params[f"layers_{i}"] for i in range(1, num_layers)]
    out["layers_scan"] = {
        "layer": jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *per)
    }
    return out


def unstack_layer_params(model_params, num_layers: int):
    """Inverse of :func:`stack_layer_params`."""
    out = {k: v for k, v in model_params.items() if k != "layers_scan"}
    stacked = model_params["layers_scan"]["layer"]
    for i in range(1, num_layers):
        out[f"layers_{i}"] = jax.tree.map(lambda x, j=i - 1: x[j], stacked)
    return out

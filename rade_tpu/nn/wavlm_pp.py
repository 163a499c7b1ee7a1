"""Pipeline-parallel WavLM/XLS-R frontend: a functional twin of
:class:`rade_tpu.nn.wavlm.WavLMFrontend` whose encoder layer stack runs as
a GPipe pipeline over the mesh ``pipe`` axis (rade_tpu/parallel/pp.py).

The reference consumes WavLM through HF on one GPU
(`/root/reference/src/models/DualStreamSEMamba.py:276-439`); here the 24
transformer layers — ~95% of flagship FLOPs (SURVEY.md §3.1) — can be
split across pipeline stages.

Param layout ("pp layout"): layer parameters are stacked along a leading
layer axis under ``layers_pipe`` (all N layers — the relative-position
bias table, which only layer 0 owns in the unrolled/scan layouts, is
HOISTED to the encoder level as ``rel_attn_embed`` so every layer has the
same tree and stacks cleanly; each stage recomputes the bucketed bias
locally from the replicated table, which is a tiny gather).  Converters
to/from the unrolled layout are provided; compose with
``stack_layer_params``/``unstack_layer_params`` for the scan layout.

The weighted N+1-hidden-state sum (the reference's 25-layer learnable
weighting, `DualStreamSEMamba.py:425-439`) is computed WITHOUT gathering
hidden states: the pipeline accumulates per-stage partial sums
sum_l w_l h_l and psums them (linearity makes this exact).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from rade_tpu.nn.wavlm import (
    WavLMConfig,
    WavLMEncoderLayer,
    WavLMFeatureEncoder,
    WavLMPositionalConvEmbedding,
    relative_position_buckets,
)
from rade_tpu.parallel import pp as _pp


# ---------------------------------------------------------------------------
# layout converters (WavLMModel params subtree)
# ---------------------------------------------------------------------------


def to_pp_layout(model_params: Dict[str, Any], num_layers: int) -> Dict[str, Any]:
    """Unrolled WavLMModel params (``layers_0..N-1``) -> pp layout
    (``rel_attn_embed`` hoisted + all N layers stacked under
    ``layers_pipe``)."""
    out = {k: v for k, v in model_params.items() if not k.startswith("layers_")}
    l0 = dict(model_params["layers_0"])
    att0 = dict(l0["attention"])
    if "rel_attn_embed" in att0:
        out["rel_attn_embed"] = att0.pop("rel_attn_embed")
    l0["attention"] = att0
    per = [l0] + [model_params[f"layers_{i}"] for i in range(1, num_layers)]
    out["layers_pipe"] = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *per)
    return out


def from_pp_layout(model_params: Dict[str, Any], num_layers: int) -> Dict[str, Any]:
    """Inverse of :func:`to_pp_layout`."""
    out = {
        k: v
        for k, v in model_params.items()
        if k not in ("layers_pipe", "rel_attn_embed")
    }
    stacked = model_params["layers_pipe"]
    for i in range(num_layers):
        out[f"layers_{i}"] = jax.tree.map(lambda x, j=i: x[j], stacked)
    if "rel_attn_embed" in model_params:
        att0 = dict(out["layers_0"]["attention"])
        att0["rel_attn_embed"] = model_params["rel_attn_embed"]
        out["layers_0"] = {**out["layers_0"], "attention": att0}
    return out


def is_pp_layout(model_params: Dict[str, Any]) -> bool:
    return "layers_pipe" in model_params


def detect_layout(model_params: Dict[str, Any]) -> Optional[str]:
    """Which encoder layer layout a WavLMModel params subtree uses:
    ``"pp"`` (stacked ``layers_pipe``), ``"scan"`` (``layers_0`` +
    ``layers_scan``), ``"unrolled"`` (``layers_0..N-1``), or None when the
    tree has no recognizable encoder layers."""
    from rade_tpu.nn.wavlm import _is_unrolled_layer_key

    if "layers_pipe" in model_params:
        return "pp"
    if "layers_scan" in model_params:
        return "scan"
    if any(_is_unrolled_layer_key(k) for k in model_params) or (
        "layers_0" in model_params
    ):
        return "unrolled"
    return None


def _layout_num_layers(model_params: Dict[str, Any], layout: str) -> int:
    from rade_tpu.nn.wavlm import _is_unrolled_layer_key

    if layout == "pp":
        return int(
            jax.tree_util.tree_leaves(model_params["layers_pipe"])[0].shape[0]
        )
    if layout == "scan":
        return 1 + int(
            jax.tree_util.tree_leaves(model_params["layers_scan"])[0].shape[0]
        )
    return 1 + sum(1 for k in model_params if _is_unrolled_layer_key(k))


def convert_layout(
    model_params: Dict[str, Any], target: str
) -> Dict[str, Any]:
    """Convert a WavLMModel params subtree between the three encoder layer
    layouts (``unrolled`` / ``scan`` / ``pp``), via unrolled as the hub.

    Returns the tree unchanged when it is already in the target layout or
    when no layout is recognizable (non-WavLM trees pass through)."""
    from rade_tpu.nn.wavlm import stack_layer_params, unstack_layer_params

    src = detect_layout(model_params)
    if src is None or src == target:
        return model_params
    n = _layout_num_layers(model_params, src)
    if src == "pp":
        u = from_pp_layout(model_params, n)
    elif src == "scan":
        u = unstack_layer_params(model_params, n)
    else:
        u = model_params
    if target == "pp":
        return to_pp_layout(u, n)
    if target == "scan":
        return stack_layer_params(u, n)
    return u


# ---------------------------------------------------------------------------
# functional forward
# ---------------------------------------------------------------------------


def _dropout(key: jax.Array, rate: float, x: jax.Array) -> jax.Array:
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def wavlm_features_pp(
    params: Dict[str, Any],
    x: jax.Array,
    cfg: WavLMConfig,
    *,
    mesh=None,
    n_micro: int = 0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """(B, T_samples) waveforms -> (B, T_frames, hidden) weighted features.

    ``params`` is the WavLMFrontend subtree — ``{"model": <pp layout>,
    "layer_weights": (N+1,)}`` (softmax weighting, the flagship path).
    ``mesh`` defaults to the pp-activated mesh; without a >1 ``pipe`` axis
    the layers run as an in-chip sequential scan with identical math.
    """
    mp = params["model"]
    if not is_pp_layout(mp):
        raise ValueError("params are not in pp layout (no layers_pipe)")
    N = cfg.num_hidden_layers
    # inside the pipeline body there is no flax mesh context: turn off the
    # declarative SP constraint and the eval-only fused attention kernel
    lcfg = dataclasses.replace(
        cfg, sequence_parallel=False, scan_layers=False, flash_attention=False,
        remat=False,
    )

    feats = WavLMFeatureEncoder(lcfg).apply(
        {"params": mp["feature_extractor"]}, x
    )
    h = nn.LayerNorm(epsilon=cfg.layer_norm_eps).apply(
        {"params": mp["feature_projection_layer_norm"]}, feats
    )
    h = nn.Dense(cfg.hidden_size).apply({"params": mp["feature_projection"]}, h)
    if train and cfg.feat_proj_dropout > 0:
        rng, k = jax.random.split(rng)
        h = _dropout(k, cfg.feat_proj_dropout, h)
    pos = WavLMPositionalConvEmbedding(lcfg).apply(
        {"params": mp["pos_conv_embed"]}, h
    )
    h = h + pos
    if not cfg.do_stable_layer_norm:
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps).apply(
            {"params": mp["encoder_layer_norm"]}, h
        )
    if train and cfg.hidden_dropout > 0:
        rng, k = jax.random.split(rng)
        h = _dropout(k, cfg.hidden_dropout, h)

    T = h.shape[1]
    if cfg.attention_type != "plain":
        buckets = relative_position_buckets(
            T, T, cfg.num_buckets, cfg.max_bucket_distance
        )
        bias = mp["rel_attn_embed"][jnp.asarray(buckets)].transpose(2, 0, 1)
    else:
        bias = None

    layer_keys = None
    if train:
        rng, k = jax.random.split(rng)
        layer_keys = jax.random.key_data(jax.random.split(k, N))

    layer_mod = WavLMEncoderLayer(lcfg, has_relative_position_bias=False)

    def layer_fn(p_j, hh, key_raw, m, bias):
        rngs = None
        if train:
            rngs = {
                "dropout": jax.random.fold_in(
                    jax.random.wrap_key_data(key_raw), m
                )
            }
        out, _ = layer_mod.apply({"params": p_j}, hh, bias, train, rngs=rngs)
        return out

    if cfg.remat:
        layer_fn = jax.checkpoint(layer_fn)

    w = jax.nn.softmax(params["layer_weights"]).astype(h.dtype)
    # taps: pre-layer h (w[0]), outputs of layers 0..N-2 (w[1..N-1]); the
    # last layer's RAW output is not a tap — its final-layernormed version
    # is the (N+1)-th state (stable-LN models)
    tap_w = jnp.concatenate([w[1:N], jnp.zeros((1,), w.dtype)])
    y, acc = _pp.pipeline_apply(
        layer_fn, mp["layers_pipe"], h, mesh, n_micro,
        tap_weights=tap_w, layer_keys=layer_keys, extra=bias,
    )
    if cfg.do_stable_layer_norm:
        final = nn.LayerNorm(epsilon=cfg.layer_norm_eps).apply(
            {"params": mp["encoder_layer_norm"]}, y
        )
    else:
        final = y
    return w[0] * h + acc + w[N] * final

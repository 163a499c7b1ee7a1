"""HF WavLM checkpoint -> Flax params conversion.

Maps a `transformers.WavLMModel` state_dict (torch tensors or numpy) onto the
parameter tree of :class:`rade_tpu.nn.wavlm.WavLMModel`.  Weight-normed
positional-conv weights are merged (g * v / ||v||) at load time.  Works with
`pretrained/microsoft/wavlm-large` style local checkpoints
(`/root/reference/src/models/DualStreamSEMamba.py:295-317` convention).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict

import numpy as np

from .wavlm import WavLMConfig


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def convert_hf_state_dict(
    state_dict: Dict[str, Any], cfg: WavLMConfig
) -> Dict[str, Any]:
    """torch WavLMModel state_dict -> flax param dict for our WavLMModel."""
    sd = {k: _np(v) for k, v in state_dict.items()}
    p: Dict[str, Any] = {}

    def dense(prefix_t, transpose=True):
        out = {"kernel": sd[f"{prefix_t}.weight"].T if transpose else sd[f"{prefix_t}.weight"]}
        if f"{prefix_t}.bias" in sd:
            out["bias"] = sd[f"{prefix_t}.bias"]
        return out

    def layernorm(prefix_t):
        return {"scale": sd[f"{prefix_t}.weight"], "bias": sd[f"{prefix_t}.bias"]}

    # --- feature extractor convs: torch (O, I, K) -> flax (K, I, O) ---
    fe: Dict[str, Any] = {}
    for i in range(len(cfg.conv_dim)):
        conv = {"kernel": sd[f"feature_extractor.conv_layers.{i}.conv.weight"].transpose(2, 1, 0)}
        if f"feature_extractor.conv_layers.{i}.conv.bias" in sd:
            conv["bias"] = sd[f"feature_extractor.conv_layers.{i}.conv.bias"]
        fe[f"conv_layers_{i}_conv"] = conv
        ln_key = f"feature_extractor.conv_layers.{i}.layer_norm.weight"
        if ln_key in sd:
            fe[f"conv_layers_{i}_layer_norm"] = layernorm(
                f"feature_extractor.conv_layers.{i}.layer_norm"
            )
    p["feature_extractor"] = fe

    p["feature_projection_layer_norm"] = layernorm("feature_projection.layer_norm")
    p["feature_projection"] = dense("feature_projection.projection")

    # --- positional conv embedding (merge weight norm) ---
    base = "encoder.pos_conv_embed.conv"
    if f"{base}.parametrizations.weight.original0" in sd:
        g = sd[f"{base}.parametrizations.weight.original0"]
        v = sd[f"{base}.parametrizations.weight.original1"]
    else:
        g = sd[f"{base}.weight_g"]
        v = sd[f"{base}.weight_v"]
    norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))  # dim=2 weight norm
    w = g * v / np.maximum(norm, 1e-12)  # (O, I/g, K)
    p["pos_conv_embed"] = {
        "conv": {"kernel": w.transpose(2, 1, 0), "bias": sd[f"{base}.bias"]}
    }

    p["encoder_layer_norm"] = layernorm("encoder.layer_norm")

    for i in range(cfg.num_hidden_layers):
        t = f"encoder.layers.{i}"
        attn = {
            "q_proj": dense(f"{t}.attention.q_proj"),
            "k_proj": dense(f"{t}.attention.k_proj"),
            "v_proj": dense(f"{t}.attention.v_proj"),
            "out_proj": dense(f"{t}.attention.out_proj"),
            "gru_rel_pos_linear": dense(f"{t}.attention.gru_rel_pos_linear"),
            "gru_rel_pos_const": sd[f"{t}.attention.gru_rel_pos_const"],
        }
        if f"{t}.attention.rel_attn_embed.weight" in sd:
            attn["rel_attn_embed"] = sd[f"{t}.attention.rel_attn_embed.weight"]
        p[f"layers_{i}"] = {
            "attention": attn,
            "layer_norm": layernorm(f"{t}.layer_norm"),
            "final_layer_norm": layernorm(f"{t}.final_layer_norm"),
            "feed_forward": {
                "intermediate_dense": dense(f"{t}.feed_forward.intermediate_dense"),
                "output_dense": dense(f"{t}.feed_forward.output_dense"),
            },
        }
    if cfg.scan_layers and cfg.num_hidden_layers > 1:
        from rade_tpu.nn.wavlm import stack_layer_params

        p = stack_layer_params(p, cfg.num_hidden_layers)
    return p


def load_pretrained(model_dir: str, cfg: WavLMConfig) -> Dict[str, Any]:
    """Load a local HF checkpoint dir (safetensors or pytorch_model.bin)."""
    model_dir = Path(model_dir)
    st_path = model_dir / "model.safetensors"
    if st_path.exists():
        from safetensors.numpy import load_file

        sd = load_file(str(st_path))
    else:
        import torch

        sd = torch.load(model_dir / "pytorch_model.bin", map_location="cpu")
    # strip optional "wavlm." prefix
    sd = {k.removeprefix("wavlm."): v for k, v in sd.items()}
    return convert_hf_state_dict(sd, cfg)

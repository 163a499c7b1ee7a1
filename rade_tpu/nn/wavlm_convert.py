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
        }
        # gated-rel-pos params exist only for WavLM-style attention; a plain
        # wav2vec2/XLS-R checkpoint has none
        if f"{t}.attention.gru_rel_pos_linear.weight" in sd:
            attn["gru_rel_pos_linear"] = dense(f"{t}.attention.gru_rel_pos_linear")
            attn["gru_rel_pos_const"] = sd[f"{t}.attention.gru_rel_pos_const"]
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


def _fairseq_key_to_hf(k: str):
    """Map a fairseq wav2vec2 state_dict key to HF Wav2Vec2Model naming.

    Covers the layout of the reference's ``xlsr2_300m.pt``
    (`/root/reference/models/official/xlsr_mamba_model.py:21-43` loads it via
    fairseq).  Returns None for keys with no flax counterpart (mask_emb,
    quantizer, project_q, ...).
    """
    import re

    m = re.match(r"feature_extractor\.conv_layers\.(\d+)\.(.+)", k)
    if m:
        i, rest = m.groups()
        if rest.startswith("0."):  # block[0] = conv
            return f"feature_extractor.conv_layers.{i}.conv.{rest[2:]}"
        # block[2] = norm: '2.1.*' (layer_norm mode, nested TransposeLast
        # Sequential) or '2.*' (group_norm mode, layer 0)
        if re.fullmatch(r"2(\.1)?\.(weight|bias)", rest):
            leaf = rest.rsplit(".", 1)[1]
            return f"feature_extractor.conv_layers.{i}.layer_norm.{leaf}"
        return None
    if k.startswith("post_extract_proj."):
        return "feature_projection.projection." + k.split(".", 1)[1]
    if k in ("layer_norm.weight", "layer_norm.bias"):
        return "feature_projection." + k
    if k.startswith("encoder.pos_conv.0."):
        return "encoder.pos_conv_embed.conv." + k.removeprefix("encoder.pos_conv.0.")
    m = re.match(r"encoder\.layers\.(\d+)\.(.+)", k)
    if m:
        i, rest = m.groups()
        rest = (
            rest.replace("self_attn_layer_norm", "layer_norm")
            .replace("self_attn.", "attention.")
            .replace("fc1", "feed_forward.intermediate_dense")
            .replace("fc2", "feed_forward.output_dense")
        )
        return f"encoder.layers.{i}.{rest}"
    if k.startswith("encoder.layer_norm."):
        return k  # final encoder LayerNorm: same name in HF
    return None


def convert_fairseq_state_dict(
    state_dict: Dict[str, Any], cfg: WavLMConfig
) -> Dict[str, Any]:
    """fairseq wav2vec2/XLS-R state_dict -> flax params (plain attention)."""
    renamed = {}
    for k, v in state_dict.items():
        k = k.removeprefix("w2v_encoder.w2v_model.")  # fine-tuned ckpts
        nk = _fairseq_key_to_hf(k)
        if nk is not None:
            renamed[nk] = v
    return convert_hf_state_dict(renamed, cfg)


def load_xlsr_checkpoint(path: str, cfg: WavLMConfig) -> Dict[str, Any]:
    """Load ``xlsr2_300m.pt`` (fairseq) or an HF wav2vec2 torch checkpoint."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    sd = raw.get("model", raw.get("state_dict", raw)) if isinstance(raw, dict) else raw
    if any(k.startswith("post_extract_proj") or ".self_attn." in k for k in sd):
        return convert_fairseq_state_dict(sd, cfg)
    sd = {k.removeprefix("wav2vec2."): v for k, v in sd.items()}
    return convert_hf_state_dict(sd, cfg)


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

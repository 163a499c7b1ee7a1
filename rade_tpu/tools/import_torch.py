"""Import reference PyTorch ``.pth`` checkpoints into rade_tpu parameter trees.

The reference trainer saves bare ``model.state_dict()`` files
(`/root/reference/src/main.py:616-618,653`).  This tool converts those into
the framework's ``{"model", "loss", "batch_stats"}`` msgpack checkpoints so
reference-trained models can be evaluated (and fine-tuned) here, enabling
cross-framework EER validation.

Conventions handled:
- ``module.``-prefix stripping (DataParallel tolerance, `src/main.py:250-256`);
- torch ``Linear.weight (out,in)`` -> flax ``kernel (in,out)``;
- torch ``Conv2d.weight (O,I,kH,kW)`` -> flax ``(kH,kW,I,O)``;
  ``Conv1d.weight (O,I,K)`` -> ``(K,I,O)``;
- BatchNorm ``weight/bias/running_mean/running_var`` -> params ``scale/bias``
  + batch_stats ``mean/var``;
- dead parameters dropped (AASIST's unused per-block ``bn1`` pre-activation,
  see `models/AASIST.py:449-453` and rade_tpu/nn/blocks.py).

CLI:
    python -m rade_tpu.tools.import_torch --config configs/AASIST.conf \
        --weights /path/to/ref.pth --out weights.ckpt
"""

from __future__ import annotations

import argparse
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()


def strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }


def _linear(sd, prefix) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _conv2d(sd, prefix) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[prefix + ".weight"]).transpose(2, 3, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _conv1d(sd, prefix) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[prefix + ".weight"]).transpose(2, 1, 0)}
    if prefix + ".bias" in sd:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _bn(sd, prefix) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    params = {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}
    stats = {
        "mean": _np(sd[prefix + ".running_mean"]),
        "var": _np(sd[prefix + ".running_var"]),
    }
    return params, stats


def _resblock(sd, prefix) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    p: Dict[str, Any] = {
        "conv1": _conv2d(sd, prefix + ".conv1"),
        "conv2": _conv2d(sd, prefix + ".conv2"),
    }
    bn_p, bn_s = _bn(sd, prefix + ".bn2")
    p["bn2"] = bn_p
    if prefix + ".conv_downsample.weight" in sd:
        p["conv_downsample"] = _conv2d(sd, prefix + ".conv_downsample")
    return p, {"bn2": bn_s}


def _gat(sd, prefix) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    p = {
        "att_proj": _linear(sd, prefix + ".att_proj"),
        "att_weight": _np(sd[prefix + ".att_weight"]),
        "proj_with_att": _linear(sd, prefix + ".proj_with_att"),
        "proj_without_att": _linear(sd, prefix + ".proj_without_att"),
    }
    bn_p, bn_s = _bn(sd, prefix + ".bn")
    p["bn"] = bn_p
    return p, {"bn": bn_s}


def _htrg_gat(sd, prefix) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    p = {
        "proj_type1": _linear(sd, prefix + ".proj_type1"),
        "proj_type2": _linear(sd, prefix + ".proj_type2"),
        "att_proj": _linear(sd, prefix + ".att_proj"),
        "att_projM": _linear(sd, prefix + ".att_projM"),
        "att_weight11": _np(sd[prefix + ".att_weight11"]),
        "att_weight22": _np(sd[prefix + ".att_weight22"]),
        "att_weight12": _np(sd[prefix + ".att_weight12"]),
        "att_weightM": _np(sd[prefix + ".att_weightM"]),
        "proj_with_att": _linear(sd, prefix + ".proj_with_att"),
        "proj_without_att": _linear(sd, prefix + ".proj_without_att"),
        "proj_with_attM": _linear(sd, prefix + ".proj_with_attM"),
        "proj_without_attM": _linear(sd, prefix + ".proj_without_attM"),
    }
    bn_p, bn_s = _bn(sd, prefix + ".bn")
    p["bn"] = bn_p
    return p, {"bn": bn_s}


def convert_aasist(
    sd: Dict[str, Any], model_config: Optional[Dict[str, Any]] = None
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference `models/AASIST.py` Model.state_dict() -> (params, batch_stats).

    The sinc bank (``conv_time``) is a plain tensor attribute in the
    reference, not a registered buffer, so it never appears in state dicts;
    both frameworks recompute the identical fixed bank.
    """
    sd = strip_module_prefix(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    params["first_bn"], stats["first_bn"] = _bn(sd, "first_bn")
    for i in range(6):
        # torch key layout: encoder.{i}.0.* (Sequential of Sequentials)
        params[f"encoder_{i}"], stats[f"encoder_{i}"] = _resblock(sd, f"encoder.{i}.0")

    for name in ("pos_S", "master1", "master2"):
        params[name] = _np(sd[name])

    for name in ("GAT_layer_S", "GAT_layer_T"):
        params[name], stats[name] = _gat(sd, name)
    for name in (
        "HtrgGAT_layer_ST11", "HtrgGAT_layer_ST12",
        "HtrgGAT_layer_ST21", "HtrgGAT_layer_ST22",
    ):
        params[name], stats[name] = _htrg_gat(sd, name)

    for name in ("pool_S", "pool_T", "pool_hS1", "pool_hT1", "pool_hS2", "pool_hT2"):
        params[name] = {"proj": _linear(sd, name + ".proj")}

    params["out_layer"] = _linear(sd, "out_layer")
    return params, stats


def _ln(sd, prefix) -> Dict[str, np.ndarray]:
    return {"scale": _np(sd[prefix + ".weight"]), "bias": _np(sd[prefix + ".bias"])}


def _mamba(sd, prefix) -> Dict[str, Any]:
    """`mamba_ssm.Mamba` / `models/modules/mamba_block.py` state dict ->
    rade_tpu MambaMixer params (in_proj/conv1d/x_proj/dt_proj/A_log/D/out_proj)."""
    return {
        "in_proj": _linear(sd, prefix + ".in_proj"),
        "conv1d": _conv1d(sd, prefix + ".conv1d"),
        "x_proj": _linear(sd, prefix + ".x_proj"),
        "dt_proj": _linear(sd, prefix + ".dt_proj"),
        "A_log": _np(sd[prefix + ".A_log"]),
        "D": _np(sd[prefix + ".D"]),
        "out_proj": _linear(sd, prefix + ".out_proj"),
    }


def _normalize_peft_keys(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Flatten PEFT-LoRA wrapping of the WavLM submodule.

    Phase-5/6 checkpoints are saved AFTER `apply_lora_to_wavlm`
    (`/root/reference/src/main.py:103-158`), so WavLM keys look like
    ``...model.base_model.model.encoder...q_proj.base_layer.weight`` with
    sibling ``lora_A.default.weight`` / ``lora_B.default.weight``.  Rewrite
    to plain HF names plus ``<proj>.lora_A/<proj>.lora_B`` pseudo-keys.
    """
    out = {}
    for k, v in sd.items():
        k = k.replace(".base_model.model.", ".")
        if ".lora_A.default.weight" in k or ".lora_A.weight" in k:
            k = k.split(".lora_A")[0] + ".lora_A"
        elif ".lora_B.default.weight" in k or ".lora_B.weight" in k:
            k = k.split(".lora_B")[0] + ".lora_B"
        else:
            k = k.replace(".base_layer.", ".")
        out[k] = v
    return out


def convert_dual_stream(
    sd: Dict[str, Any], model_config: Optional[Dict[str, Any]] = None
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference `src/models/DualStreamSEMamba.py` Model.state_dict() ->
    (params, batch_stats) for rade_tpu's DualStreamSEMamba.

    Handles: HF WavLM submodule (via `wavlm_convert.convert_hf_state_dict`),
    PEFT-LoRA wrapping (adapters -> explicit lora_A_*/lora_B_* params), the
    SincNet frontend (same block layout as AASIST), fusion/SE, the shared
    BiMamba mixers, and the pooling/classifier heads.  The sinc bank is a
    non-registered tensor in the reference (never in state dicts); both
    frameworks recompute the identical fixed bank.
    """
    from rade_tpu.nn.wavlm import WavLMConfig
    from rade_tpu.nn.wavlm_convert import convert_hf_state_dict

    sd = _normalize_peft_keys(strip_module_prefix(sd))
    model_config = model_config or {}
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    # --- WavLM stream ---
    wl_prefix = "wavlm_stream.model."
    wl_sd = {
        k[len(wl_prefix):]: v for k, v in sd.items() if k.startswith(wl_prefix)
    }
    lora_rank = 0
    lora_keys = [k for k in wl_sd if k.endswith(".lora_A")]
    if lora_keys:
        lora_rank = _np(wl_sd[lora_keys[0]]).shape[0]
    variant = str(model_config.get("wavlm_variant", "large"))
    kw = dict(
        lora_rank=lora_rank or int(model_config.get("lora_r", 0)),
        lora_alpha=int(model_config.get("lora_alpha", 32)),
        scan_layers=bool(model_config.get("wavlm_scan_layers", False)),
    )
    wcfg = {
        "large": WavLMConfig.large, "base": WavLMConfig.base,
        "tiny": WavLMConfig.tiny,
    }[variant](**kw)
    hf_keys = {
        k: v for k, v in wl_sd.items() if ".lora_" not in k
        and not k.startswith("masked_spec_embed")
    }
    wl_params = convert_hf_state_dict(hf_keys, wcfg)
    if lora_keys:
        # lora_A torch (r, in) -> flax (in, r); lora_B (out, r) -> (r, out)
        for i in range(wcfg.num_hidden_layers):
            t = f"encoder.layers.{i}.attention"
            layer = wl_params[f"layers_{i}"]["attention"]
            for proj in ("q_proj", "v_proj"):
                layer[f"lora_A_{proj}"] = _np(wl_sd[f"{t}.{proj}.lora_A"]).T
                layer[f"lora_B_{proj}"] = _np(wl_sd[f"{t}.{proj}.lora_B"]).T
        if wcfg.scan_layers:
            from rade_tpu.nn.wavlm import stack_layer_params

            wl_params = stack_layer_params(wl_params, wcfg.num_hidden_layers)
    params["wavlm_stream"] = {
        "model": wl_params,
        "layer_weights": _np(sd["wavlm_stream.layer_weights"]),
    }

    # --- SincNet stream (AASIST frontend layout) ---
    sinc_p: Dict[str, Any] = {}
    sinc_s: Dict[str, Any] = {}
    sinc_p["first_bn"], sinc_s["first_bn"] = _bn(sd, "sinc_stream.first_bn")
    for i in range(6):
        sinc_p[f"encoder_{i}"], sinc_s[f"encoder_{i}"] = _resblock(
            sd, f"sinc_stream.encoder.{i}.0"
        )
    params["sinc_stream"] = sinc_p
    stats["sinc_stream"] = sinc_s

    # --- fusion ---
    params["fusion"] = {
        "ln_wavlm": _ln(sd, "fusion.ln_wavlm"),
        "ln_sinc": _ln(sd, "fusion.ln_sinc"),
        "wavlm_proj": _linear(sd, "fusion.wavlm_proj"),
        "sinc_proj": _linear(sd, "fusion.sinc_proj"),
        "fusion_proj": _linear(sd, "fusion.fusion_proj"),
        "se_layer": {
            "fc1": _linear(sd, "fusion.se_layer.fc.0"),
            "fc2": _linear(sd, "fusion.se_layer.fc.2"),
        },
        "norm": _ln(sd, "fusion.norm"),
    }

    # --- BiMamba backbone ---
    n_enc = 0
    while f"backbone_layers.{n_enc}.norm1.weight" in sd:
        n_enc += 1
    for i in range(n_enc):
        t = f"backbone_layers.{i}"
        params[f"backbone_{i}"] = {
            "norm1": _ln(sd, f"{t}.norm1"),
            "norm2": _ln(sd, f"{t}.norm2"),
            "mamba": _mamba(sd, f"{t}.mamba"),
            "ff1": _linear(sd, f"{t}.feed_forward.0"),
            "ff2": _linear(sd, f"{t}.feed_forward.2"),
        }

    # --- heads ---
    params["norm_f"] = _ln(sd, "norm_f")
    params["attention_pool"] = _linear(sd, "attention_pool")
    params["classifier"] = _linear(sd, "classifier")
    return params, stats


def _resblock1d(sd, prefix) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """RawNet2 `Residual_block` (1-D). The non-first blocks compute a
    bn1+LeakyReLU pre-activation and then DISCARD it (conv1 takes the raw
    input, `models/RawNet2Spoof.py:147-155`) — bn1 is dropped here like
    AASIST's dead bn1."""
    p: Dict[str, Any] = {
        "conv1": _conv1d(sd, prefix + ".conv1"),
        "conv2": _conv1d(sd, prefix + ".conv2"),
    }
    bn_p, bn_s = _bn(sd, prefix + ".bn2")
    p["bn2"] = bn_p
    if prefix + ".conv_downsample.weight" in sd:
        p["conv_downsample"] = _conv1d(sd, prefix + ".conv_downsample")
    return p, {"bn2": bn_s}


def _gru_layer(sd, k: int) -> Dict[str, Any]:
    """torch nn.GRU layer k -> flax GRUCell params.

    torch stacks gates [r; z; n] in weight_ih/weight_hh and keeps two bias
    vectors; flax fuses the r/z input+hidden biases (hr/hz are bias-free)
    and keeps hn's bias separate (it sits inside the r* gate product, same
    as torch's b_hn).
    """
    wih = _np(sd[f"gru.weight_ih_l{k}"])
    whh = _np(sd[f"gru.weight_hh_l{k}"])
    bih = _np(sd[f"gru.bias_ih_l{k}"])
    bhh = _np(sd[f"gru.bias_hh_l{k}"])
    H = whh.shape[1]
    r, z, n = slice(0, H), slice(H, 2 * H), slice(2 * H, 3 * H)
    return {
        "ir": {"kernel": wih[r].T, "bias": bih[r] + bhh[r]},
        "iz": {"kernel": wih[z].T, "bias": bih[z] + bhh[z]},
        "in": {"kernel": wih[n].T, "bias": bih[n]},
        "hr": {"kernel": whh[r].T},
        "hz": {"kernel": whh[z].T},
        "hn": {"kernel": whh[n].T, "bias": bhh[n]},
    }


def convert_rawnet2(
    sd: Dict[str, Any], model_config: Optional[Dict[str, Any]] = None
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference `models/RawNet2Spoof.py` Model.state_dict() ->
    (params, batch_stats).  The sinc bank (`Sinc_conv`) is a plain tensor
    attribute, never in state dicts."""
    sd = strip_module_prefix(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["first_bn"], stats["first_bn"] = _bn(sd, "first_bn")
    for i in range(6):
        params[f"block{i}"], stats[f"block{i}"] = _resblock1d(sd, f"block{i}.0")
        params[f"fc_attention{i}"] = _linear(sd, f"fc_attention{i}.0")
    params["bn_before_gru"], stats["bn_before_gru"] = _bn(sd, "bn_before_gru")
    k = 0
    while f"gru.weight_ih_l{k}" in sd:
        params[f"gru_{k}"] = _gru_layer(sd, k)
        k += 1
    params["fc1_gru"] = _linear(sd, "fc1_gru")
    params["fc2_gru"] = _linear(sd, "fc2_gru")
    return params, stats


def convert_rawgat(
    sd: Dict[str, Any], model_config: Optional[Dict[str, Any]] = None
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Reference `models/RawNetGatSpoofST.py` Model.state_dict() ->
    (params, batch_stats): dual spectral/temporal res-block encoders, three
    GAT layers, graph pools, node projections."""
    sd = strip_module_prefix(sd)
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["first_bn"], stats["first_bn"] = _bn(sd, "first_bn")
    for enc in ("encoder_T", "encoder_S"):
        for i in range(6):
            params[f"{enc}_{i}"], stats[f"{enc}_{i}"] = _resblock(sd, f"{enc}.{i}.0")
    for g in ("GAT_layer_T", "GAT_layer_S", "GAT_layer_ST"):
        params[g], stats[g] = _gat(sd, g)
    for pool in ("pool_T", "pool_S", "pool_ST"):
        params[pool] = {"proj": _linear(sd, pool + ".proj")}
    for lin in ("proj_T", "proj_S", "proj_ST", "out_layer"):
        params[lin] = _linear(sd, lin)
    return params, stats


CONVERTERS = {
    "AASIST": convert_aasist,
    "AASIST-L": convert_aasist,
    "DualStreamSEMamba": convert_dual_stream,
    "RawNet2Spoof": convert_rawnet2,
    "RawNetGatSpoofST": convert_rawgat,
}


def convert_state_dict(
    architecture: str, sd: Dict[str, Any],
    model_config: Optional[Dict[str, Any]] = None,
):
    if architecture not in CONVERTERS:
        raise ValueError(
            f"no torch importer for architecture {architecture!r}; "
            f"available: {sorted(CONVERTERS)}"
        )
    return CONVERTERS[architecture](sd, model_config)


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True, help=".conf for the target model")
    ap.add_argument("--weights", required=True, help="reference .pth state dict")
    ap.add_argument("--out", required=True, help="output .ckpt (msgpack)")
    args = ap.parse_args(argv)

    import torch
    import jax

    from rade_tpu.config import load_config
    from rade_tpu.train.checkpoint import save_state
    from rade_tpu.train.loop import Experiment

    cfg = load_config(args.config)
    arch = cfg.model_config["architecture"]
    sd = torch.load(args.weights, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    params, stats = convert_state_dict(arch, sd, dict(cfg.model_config))

    exp = Experiment(cfg, seed=0)
    tree = {
        "model": jax.tree.map(lambda x: x, params),
        "loss": exp.params["loss"],
        "batch_stats": stats,
    }
    # structural check against the freshly-initialized model
    ref_paths = {jax.tree_util.keystr(k) for k, _ in
                 jax.tree_util.tree_flatten_with_path(exp.params["model"])[0]}
    got_paths = {jax.tree_util.keystr(k) for k, _ in
                 jax.tree_util.tree_flatten_with_path(params)[0]}
    missing, extra = ref_paths - got_paths, got_paths - ref_paths
    if missing or extra:
        raise ValueError(f"param tree mismatch: missing={sorted(missing)[:8]} "
                         f"extra={sorted(extra)[:8]}")
    save_state(args.out, tree)
    print(f"wrote {args.out} ({arch}, {len(got_paths)} model arrays)")


if __name__ == "__main__":
    main()

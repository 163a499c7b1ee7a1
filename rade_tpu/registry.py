"""Model registry: architecture name -> constructor.

Replaces the reference's `import_module("models." + architecture)` namespace
hack (`/root/reference/src/main.py:799-812`) — which required different CWDs
for different models — with one explicit registry.  Reference architecture
names all resolve here.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

_REGISTRY: Dict[str, Callable[[Dict[str, Any]], Any]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def build_model(model_config: Dict[str, Any]):
    """Instantiate a Flax module from a reference-style model_config dict."""
    name = model_config["architecture"]
    if name not in _REGISTRY:
        _ensure_builtin(name)
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown architecture {name!r}; known: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](model_config)


def available() -> list:
    for n in list(_BUILTIN):
        try:
            _ensure_builtin(n)
        except ImportError:  # model family not built yet
            continue
    return sorted(_REGISTRY)


# Lazy imports so importing the registry stays cheap.
_BUILTIN = {
    "AASIST": ("rade_tpu.models.aasist", "AASIST"),
    "RawNet2Spoof": ("rade_tpu.models.rawnet2", "RawNet2"),
    "RawNetGatSpoofST": ("rade_tpu.models.rawgat_st", "RawGATST"),
    "DualStreamSEMamba": ("rade_tpu.models.dual_stream_se_mamba", "DualStreamSEMamba"),
    "MoEMambaASV": ("rade_tpu.models.moe_mamba", "MoEMambaASV"),
    "XLSRMamba": ("rade_tpu.models.xlsr_mamba", "XLSRMamba"),
    "XLSRConformer": ("rade_tpu.models.xlsr_conformer", "XLSRConformer"),
    # zoo stragglers the reference vendors unimportably (fake_mamba_model.py)
    "XLSRTransformer": ("rade_tpu.models.xlsr_zoo", "XLSRTransformer"),
    "XLSRAASIST": ("rade_tpu.models.xlsr_zoo", "XLSRAASIST"),
    "XLSRSLSMamba2": ("rade_tpu.models.xlsr_zoo", "XLSRSLSMamba2"),
    # the rest of the Fake-Mamba experiment zoo (models/fake_mamba_zoo.py)
    "FakeMamba": ("rade_tpu.models.fake_mamba_zoo", "FakeMamba"),
    "XLSRAttWConformer": ("rade_tpu.models.fake_mamba_zoo", "XLSRAttWConformer"),
    "MLXLSRConformer": ("rade_tpu.models.fake_mamba_zoo", "MLXLSRConformer"),
    "MLMamba": ("rade_tpu.models.fake_mamba_zoo", "MLMamba"),
    "MLXLSXBiMambaFFNSLS": ("rade_tpu.models.fake_mamba_zoo", "MLXLSXBiMambaFFNSLS"),
    "MLXLSX10BiMambaFFN": ("rade_tpu.models.fake_mamba_zoo", "MLXLSX10BiMambaFFN"),
    "MLXLSXBiMambaFFN": ("rade_tpu.models.fake_mamba_zoo", "MLXLSXBiMambaFFN"),
    "XLSXSLSMamba": ("rade_tpu.models.fake_mamba_zoo", "XLSXSLSMamba"),
    "XLSXCBAMSLS": ("rade_tpu.models.fake_mamba_zoo", "XLSXCBAMSLS"),
    "MLCBAMMamba": ("rade_tpu.models.fake_mamba_zoo", "MLCBAMMamba"),
    "XLSXSLSAttMamba": ("rade_tpu.models.fake_mamba_zoo", "XLSXSLSAttMamba"),
    "XLSXSLSDualMamba": ("rade_tpu.models.fake_mamba_zoo", "XLSXSLSDualMamba"),
    "XLSXMamba1": ("rade_tpu.models.fake_mamba_zoo", "XLSXMamba1"),
}


def _ensure_builtin(name: str) -> None:
    if name in _REGISTRY or name not in _BUILTIN:
        return
    import importlib

    module_name, cls_name = _BUILTIN[name]
    cls = getattr(importlib.import_module(module_name), cls_name)
    _REGISTRY[name] = cls.from_config

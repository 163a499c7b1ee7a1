"""Cross-framework import of the flagship DualStreamSEMamba.

The reference model (`/root/reference/src/models/DualStreamSEMamba.py`)
depends on two unavailable externals, both replaced by NUMERICALLY
EQUIVALENT stand-ins so the torch oracle runs on CPU:

- `mamba_ssm.modules.mamba_simple.Mamba` (CUDA) -> the reference's own
  pure-torch executable spec `models/modules/mamba_block.py::MambaBlock`
  (same parameter names/shapes, same recurrence);
- `microsoft/wavlm-large` weights -> a tiny randomly-initialized HF
  `WavLMModel` (the frontend code path is identical).

The oracle's random state_dict is converted with
`tools/import_torch.convert_dual_stream` and end-to-end forward parity is
checked: every detail of WavLM, the SincNet frontend, fusion/SE, the shared
BiMamba mixers, pooling and the classifier must line up.
"""

import importlib.util
import sys
import types
from pathlib import Path
from types import SimpleNamespace

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rade_tpu.registry import build_model
from rade_tpu.tools.import_torch import convert_dual_stream

pytestmark = pytest.mark.slow  # compiles full train steps on the CPU mesh

REF_ROOT = Path("/root/reference")

TINY_HF = dict(
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    conv_dim=(16, 16, 16),
    conv_kernel=(10, 3, 3),
    conv_stride=(5, 2, 2),
    num_feat_extract_layers=3,
    feat_extract_norm="layer",
    conv_bias=True,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    num_buckets=40,
    max_bucket_distance=100,
    do_stable_layer_norm=True,
    hidden_dropout=0.0,
    activation_dropout=0.0,
    attention_dropout=0.0,
    feat_proj_dropout=0.0,
    layerdrop=0.0,
)

MODEL_CONFIG = {
    "architecture": "DualStreamSEMamba",
    "emb_size": 24,
    "num_encoders": 2,
    "d_state": 4,
    "sinc_channels": 70,
    "se_reduction": 16,
    "wavlm_variant": "tiny",
    "wavlm_remat": False,
}


def _load_module(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_model():
    if not REF_ROOT.exists():
        pytest.skip("reference not mounted")
    import transformers

    # stand-in 1: pure-torch MambaBlock as mamba_ssm.Mamba
    mb = _load_module(REF_ROOT / "models/modules/mamba_block.py", "ref_mamba_block")
    pkg = types.ModuleType("mamba_ssm")
    mods = types.ModuleType("mamba_ssm.modules")
    simple = types.ModuleType("mamba_ssm.modules.mamba_simple")
    simple.Mamba = mb.MambaBlock
    pkg.Mamba = mb.MambaBlock
    pkg.modules = mods
    mods.mamba_simple = simple
    sys.modules.setdefault("mamba_ssm", pkg)
    sys.modules.setdefault("mamba_ssm.modules", mods)
    sys.modules.setdefault("mamba_ssm.modules.mamba_simple", simple)

    # stand-in 2: tiny random WavLM instead of wavlm-large
    hf_cfg = transformers.WavLMConfig(**TINY_HF)
    orig_fp = transformers.WavLMModel.from_pretrained
    transformers.WavLMModel.from_pretrained = classmethod(
        lambda cls, *a, **k: transformers.WavLMModel(hf_cfg)
    )
    try:
        ds = _load_module(
            REF_ROOT / "src/models/DualStreamSEMamba.py", "ref_dual_stream"
        )
        # the reference hardcodes out_dim = 1024 (wavlm-large); derive it
        # from the stand-in's config instead
        orig_init = ds.WavLMFrontend.__init__

        def _patched_init(self, *a, **k):
            orig_init(self, *a, **k)
            self.out_dim = self.model.config.hidden_size

        ds.WavLMFrontend.__init__ = _patched_init
        torch.manual_seed(0)
        args = SimpleNamespace(
            emb_size=24, num_encoders=2, d_state=4, sinc_channels=70,
            wavlm_freeze_layers=-1,
        )
        model = ds.Model(args, device="cpu")
    finally:
        transformers.WavLMModel.from_pretrained = orig_fp

    # the reference hardcodes 25 layer weights (wavlm-large); resize for the
    # tiny 3-hidden-state stand-in, with non-uniform values so the weighting
    # path is actually exercised
    n_states = hf_cfg.num_hidden_layers + 1
    model.wavlm_stream.layer_weights = torch.nn.Parameter(
        torch.linspace(-0.5, 0.5, n_states)
    )
    model.eval()
    return model


def test_flagship_state_dict_converts_to_full_tree(ref_model):
    import jax

    params, stats = convert_dual_stream(ref_model.state_dict(), MODEL_CONFIG)
    model = build_model(dict(MODEL_CONFIG))
    x = jnp.zeros((1, 16000), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def paths(tree):
        return {
            jax.tree_util.keystr(k)
            for k, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    missing = paths(variables["params"]) - paths(params)
    extra = paths(params) - paths(variables["params"])
    assert not missing, sorted(missing)[:10]
    assert not extra, sorted(extra)[:10]
    assert paths(stats) == paths(variables["batch_stats"])


def test_flagship_forward_parity(ref_model):
    rng = np.random.RandomState(1)
    x = rng.randn(2, 16000).astype(np.float32) * 0.1

    with torch.no_grad():
        feats_t, logits_t = ref_model(torch.tensor(x))

    params, stats = convert_dual_stream(ref_model.state_dict(), MODEL_CONFIG)
    model = build_model(dict(MODEL_CONFIG))
    feats_j, logits_j = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=False, freq_aug=False,
    )

    np.testing.assert_allclose(
        np.asarray(logits_j), logits_t.numpy(), rtol=1e-3, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(feats_j), feats_t.numpy(), rtol=1e-3, atol=1e-3
    )


def test_peft_key_normalization():
    from rade_tpu.tools.import_torch import _normalize_peft_keys

    sd = {
        "wavlm_stream.model.base_model.model.encoder.layers.0.attention.q_proj.base_layer.weight": 1,
        "wavlm_stream.model.base_model.model.encoder.layers.0.attention.q_proj.lora_A.default.weight": 2,
        "wavlm_stream.model.base_model.model.encoder.layers.0.attention.q_proj.lora_B.default.weight": 3,
        "classifier.weight": 4,
    }
    out = _normalize_peft_keys(sd)
    assert out["wavlm_stream.model.encoder.layers.0.attention.q_proj.weight"] == 1
    assert out["wavlm_stream.model.encoder.layers.0.attention.q_proj.lora_A"] == 2
    assert out["wavlm_stream.model.encoder.layers.0.attention.q_proj.lora_B"] == 3
    assert out["classifier.weight"] == 4

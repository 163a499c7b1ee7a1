"""XLS-R (wav2vec2) Flax encoder parity vs torch `transformers`, and the
fairseq-key converter.

The reference's XLSR family loads fairseq ``xlsr2_300m.pt``
(`/root/reference/models/official/xlsr_mamba_model.py:21-43`); our encoder is
the plain-attention variant of the WavLM module (`WavLMConfig.xlsr300m`),
with converters for both HF wav2vec2 and fairseq state dicts.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from rade_tpu.nn.wavlm import WavLMConfig, WavLMModel
from rade_tpu.nn.wavlm_convert import (
    _fairseq_key_to_hf,
    convert_fairseq_state_dict,
    convert_hf_state_dict,
)

pytestmark = pytest.mark.slow  # jit-compiles model forwards on the CPU mesh


def _tiny_hf_w2v2_config():
    from transformers import Wav2Vec2Config

    return Wav2Vec2Config(
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
        do_stable_layer_norm=True,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        apply_spec_augment=False,
    )


@pytest.fixture(scope="module")
def torch_and_flax():
    import torch
    from transformers import Wav2Vec2Model as HFModel

    torch.manual_seed(0)
    hf = HFModel(_tiny_hf_w2v2_config()).eval()
    cfg = WavLMConfig.xlsr_tiny()
    params = convert_hf_state_dict(hf.state_dict(), cfg)
    return hf, cfg, params


def test_forward_matches_torch_wav2vec2(torch_and_flax):
    import torch

    hf, cfg, params = torch_and_flax
    rng = np.random.RandomState(0)
    x = rng.randn(2, 3200).astype(np.float32) * 0.1

    with torch.no_grad():
        out = hf(torch.tensor(x), output_hidden_states=True)
    torch_last = out.last_hidden_state.numpy()
    torch_hidden = [h.numpy() for h in out.hidden_states]

    model = WavLMModel(cfg)
    last, hidden = model.apply({"params": params}, jnp.asarray(x), train=False)

    assert np.asarray(last).shape == torch_last.shape
    np.testing.assert_allclose(np.asarray(last), torch_last, rtol=2e-3, atol=5e-4)
    assert len(hidden) == len(torch_hidden) == cfg.num_hidden_layers + 1
    for ours, ref in zip(hidden, torch_hidden):
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=5e-4)


def test_plain_attention_has_no_gating_params():
    import jax

    cfg = WavLMConfig.xlsr_tiny()
    model = WavLMModel(cfg)
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 1600), jnp.float32), False,
    )["params"]
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = "/".join(
        "/".join(str(getattr(k, "key", "")) for k in path) for path, _ in flat
    )
    assert "gru_rel_pos" not in names and "rel_attn_embed" not in names


def _hf_key_to_fairseq(k: str):
    """Inverse renaming (test-only) to synthesize a fairseq-style dict."""
    k = k.replace("feature_projection.projection.", "post_extract_proj.")
    k = k.replace("feature_projection.layer_norm.", "layer_norm.")
    k = k.replace("encoder.pos_conv_embed.conv.", "encoder.pos_conv.0.")
    if "conv_layers" in k:
        k = k.replace(".conv.", ".0.").replace(".layer_norm.", ".2.1.")
    if "encoder.layers." in k:
        k = k.replace(".attention.", ".self_attn.")
        k = k.replace(".layer_norm.", ".self_attn_layer_norm.")
        k = k.replace(".self_attn_final_layer_norm.", ".final_layer_norm.")
        k = k.replace(".feed_forward.intermediate_dense.", ".fc1.")
        k = k.replace(".feed_forward.output_dense.", ".fc2.")
    return k


def test_fairseq_key_mapping_roundtrip(torch_and_flax):
    """fairseq-named dict converts to the same flax tree as the HF dict."""
    import jax

    hf, cfg, params_hf = torch_and_flax
    sd = hf.state_dict()
    fairseq_sd = {}
    for k, v in sd.items():
        fk = _hf_key_to_fairseq(k)
        # final_layer_norm inside layers must not become self_attn_* twice
        fairseq_sd[fk] = v
    fairseq_sd["mask_emb"] = np.zeros((32,), np.float32)  # ignored extras
    params_fs = convert_fairseq_state_dict(fairseq_sd, cfg)

    flat_hf = jax.tree_util.tree_flatten_with_path(params_hf)[0]
    flat_fs = jax.tree_util.tree_flatten_with_path(params_fs)[0]
    assert len(flat_hf) == len(flat_fs)
    for (p1, v1), (p2, v2) in zip(flat_hf, flat_fs):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_fairseq_key_corner_cases():
    assert (
        _fairseq_key_to_hf("encoder.layers.3.self_attn.q_proj.weight")
        == "encoder.layers.3.attention.q_proj.weight"
    )
    assert (
        _fairseq_key_to_hf("encoder.layers.3.final_layer_norm.bias")
        == "encoder.layers.3.final_layer_norm.bias"
    )
    assert (
        _fairseq_key_to_hf("feature_extractor.conv_layers.0.2.1.weight")
        == "feature_extractor.conv_layers.0.layer_norm.weight"
    )
    assert (
        _fairseq_key_to_hf("feature_extractor.conv_layers.2.0.weight")
        == "feature_extractor.conv_layers.2.conv.weight"
    )
    assert _fairseq_key_to_hf("quantizer.vars") is None
    assert _fairseq_key_to_hf("mask_emb") is None
    assert (
        _fairseq_key_to_hf("encoder.layer_norm.weight")
        == "encoder.layer_norm.weight"
    )


def test_xlsr_mamba_builds_with_xlsr_frontend():
    import jax

    from rade_tpu.models.xlsr_mamba import XLSRMamba

    model = XLSRMamba.from_config(
        {"emb_size": 16, "num_encoders": 2, "d_state": 4,
         "ssl_variant": "xlsr_tiny", "wavlm_remat": False}
    )
    x = jnp.zeros((2, 3200), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    )
    feats, logits = model.apply(variables, x, train=False)
    assert feats.shape == (2, 16) and logits.shape == (2, 2)


def test_experiment_loads_ssl_checkpoint(tmp_path, torch_and_flax):
    """model_config.ssl_checkpoint splices fairseq weights at build time."""
    import torch

    from rade_tpu.config import ExperimentConfig
    from rade_tpu.train.loop import Experiment

    hf, cfg, params_hf = torch_and_flax
    sd = {_hf_key_to_fairseq(k): v for k, v in hf.state_dict().items()}
    ckpt = tmp_path / "xlsr_tiny.pt"
    torch.save({"model": sd}, ckpt)

    conf = ExperimentConfig.from_dict({
        "database_path": "", "asv_score_path": "", "model_path": "",
        "batch_size": 2, "num_epochs": 1, "loss": "CCE", "track": "LA",
        "model_config": {
            "architecture": "XLSRMamba", "nb_samp": 3200, "emb_size": 16,
            "num_encoders": 2, "d_state": 4, "ssl_variant": "xlsr_tiny",
            "wavlm_remat": False, "ssl_checkpoint": str(ckpt),
        },
        "optim_config": {"base_lr": 1e-4},
        "training_config": {}, "data_config": {}, "test_config": {},
    })
    exp = Experiment(conf, seed=0)
    got = np.asarray(
        exp.params["model"]["ssl_model"]["feature_projection"]["kernel"]
    )
    want = np.asarray(params_hf["feature_projection"]["kernel"])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

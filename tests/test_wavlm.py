"""WavLM Flax port parity vs the torch `transformers` implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rade_tpu.nn.wavlm import WavLMConfig, WavLMFrontend, WavLMModel, wavlm_frozen_paths
from rade_tpu.nn.wavlm_convert import convert_hf_state_dict

pytestmark = pytest.mark.slow  # jit-compiles model forwards on the CPU mesh


def _tiny_hf_config():
    from transformers import WavLMConfig as HFConfig

    return HFConfig(
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
        apply_spec_augment=False,
    )


@pytest.fixture(scope="module")
def torch_and_flax():
    import torch
    from transformers import WavLMModel as HFModel

    torch.manual_seed(0)
    hf = HFModel(_tiny_hf_config()).eval()
    cfg = WavLMConfig.tiny()
    params = convert_hf_state_dict(hf.state_dict(), cfg)
    return hf, cfg, params


def test_forward_matches_torch(torch_and_flax):
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
    last = np.asarray(last)

    assert last.shape == torch_last.shape
    np.testing.assert_allclose(last, torch_last, rtol=2e-3, atol=2e-4)
    assert len(hidden) == len(torch_hidden) == cfg.num_hidden_layers + 1
    for ours, ref in zip(hidden, torch_hidden):
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-4)


def test_frontend_layer_weighting(torch_and_flax):
    _, cfg, params = torch_and_flax
    frontend = WavLMFrontend(cfg)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 3200)) * 0.1
    fparams = frontend.init({"params": rng}, x, train=False)["params"]
    # splice the converted torch weights into the frontend's inner model
    fparams = {"model": params, "layer_weights": fparams["layer_weights"]}
    y = frontend.apply({"params": fparams}, x, train=False)
    assert y.shape[0] == 1 and y.shape[2] == cfg.hidden_size
    assert np.all(np.isfinite(np.asarray(y)))
    # uniform init weights => output == mean of hidden states
    model = WavLMModel(cfg)
    _, hidden = model.apply({"params": params}, x, train=False)
    mean_h = np.mean(np.stack([np.asarray(h) for h in hidden]), axis=0)
    np.testing.assert_allclose(np.asarray(y), mean_h, rtol=1e-4, atol=1e-5)


def test_lora_params_and_zero_init_identity(torch_and_flax):
    _, cfg, params = torch_and_flax
    import dataclasses

    lora_cfg = dataclasses.replace(cfg, lora_rank=4)
    model = WavLMModel(lora_cfg)
    rng = jax.random.PRNGKey(1)
    x = jax.random.normal(rng, (1, 3200)) * 0.1
    lora_params = model.init({"params": rng}, x, train=False)["params"]
    # LoRA B zero-init => adding adapters to converted weights is an identity
    for i in range(cfg.num_hidden_layers):
        attn = lora_params[f"layers_{i}"]["attention"]
        assert "lora_A_q_proj" in attn and "lora_B_v_proj" in attn
        for name in ("q_proj", "v_proj"):
            params[f"layers_{i}"]["attention"][f"lora_A_{name}"] = attn[f"lora_A_{name}"]
            params[f"layers_{i}"]["attention"][f"lora_B_{name}"] = attn[f"lora_B_{name}"]
    base_model = WavLMModel(cfg)
    y_base, _ = base_model.apply({"params": {k: v for k, v in params.items()}}, x, train=False)
    y_lora, _ = model.apply({"params": params}, x, train=False)
    np.testing.assert_allclose(np.asarray(y_base), np.asarray(y_lora), rtol=1e-5, atol=1e-6)


def test_frozen_paths():
    paths = wavlm_frozen_paths(freeze_layers=12, num_layers=24)
    assert "feature_extractor" in paths and "feature_projection" in paths
    assert "layers_11/" in paths and "layers_12/" not in paths
    assert wavlm_frozen_paths(-1) == ("feature_extractor", "feature_projection")
    assert wavlm_frozen_paths(0, use_lora=True) == ("wavlm_stream/model",)


# ---------------------------------------------------------------------------
# scan-over-layers encoder mode
# ---------------------------------------------------------------------------


def _tiny_cfg(**kw):
    import dataclasses

    return dataclasses.replace(WavLMConfig.tiny(), num_hidden_layers=4, **kw)


def test_scan_layers_matches_unrolled():
    """Stacked nn.scan encoder == unrolled encoder at identical params."""
    from rade_tpu.nn.wavlm import stack_layer_params

    cfg_u = _tiny_cfg()
    cfg_s = _tiny_cfg(scan_layers=True)
    model_u = WavLMModel(cfg_u)
    model_s = WavLMModel(cfg_s)

    x = jnp.asarray(np.random.RandomState(0).randn(2, 3200).astype(np.float32))
    params_u = model_u.init(jax.random.PRNGKey(0), x)["params"]
    params_s = stack_layer_params(params_u, cfg_u.num_hidden_layers)

    # structures must agree with a fresh scan-mode init
    ref_s = model_s.init(jax.random.PRNGKey(1), x)["params"]
    assert jax.tree_util.tree_structure(params_s) == jax.tree_util.tree_structure(ref_s)

    out_u, hid_u = model_u.apply({"params": params_u}, x, train=False)
    out_s, hid_s = model_s.apply({"params": params_s}, x, train=False)
    assert len(hid_u) == len(hid_s) == cfg_u.num_hidden_layers + 1
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u), rtol=1e-5, atol=1e-5)
    for k, (a, b) in enumerate(zip(hid_s, hid_u)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5,
            err_msg=f"hidden state {k}",
        )


def test_scan_layers_roundtrip_unstack():
    from rade_tpu.nn.wavlm import stack_layer_params, unstack_layer_params

    cfg = _tiny_cfg()
    x = jnp.zeros((1, 3200), jnp.float32)
    params = WavLMModel(cfg).init(jax.random.PRNGKey(0), x)["params"]
    back = unstack_layer_params(
        stack_layer_params(params, cfg.num_hidden_layers), cfg.num_hidden_layers
    )
    for (ka, a), (kb, b) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(params)[0], key=lambda t: jax.tree_util.keystr(t[0])),
        sorted(jax.tree_util.tree_flatten_with_path(back)[0], key=lambda t: jax.tree_util.keystr(t[0])),
    ):
        assert jax.tree_util.keystr(ka) == jax.tree_util.keystr(kb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_scan_layers_grad_flows_and_remat():
    cfg = _tiny_cfg(scan_layers=True, remat=True)
    model = WavLMModel(cfg)
    x = jnp.asarray(np.random.RandomState(1).randn(1, 3200).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)["params"]

    def loss(p):
        out, _ = model.apply({"params": p}, x, train=False)
        return jnp.sum(out**2)

    g = jax.grad(loss)(params)
    stacked_leaf = jax.tree.leaves(g["layers_scan"])[0]
    assert np.all(np.isfinite(np.asarray(stacked_leaf)))
    assert float(jnp.abs(stacked_leaf).sum()) > 0


def test_remat_policy_grads_match_full():
    """`wavlm_remat_policy` only changes WHAT the backward recomputes, never
    the math: 'dots'/'dots_no_batch' grads are bit-identical to 'full'.
    (A/B on hardware: both policies measured SLOWER than full recompute at
    the Phase-6 shapes — see docs/BENCH_NOTES.md; the knob ships 'full'.)"""
    x = jnp.asarray(np.random.RandomState(2).randn(1, 3200).astype(np.float32))
    grads = {}
    for pol in ("full", "dots", "dots_no_batch"):
        cfg = _tiny_cfg(scan_layers=True, remat=True, remat_policy=pol)
        model = WavLMModel(cfg)
        params = model.init(jax.random.PRNGKey(0), x)["params"]

        def loss(p):
            out, _ = model.apply({"params": p}, x, train=False)
            return jnp.sum(out**2)

        grads[pol] = jax.grad(loss)(params)
    for pol in ("dots", "dots_no_batch"):
        jax.tree.map(
            np.testing.assert_array_equal, grads["full"], grads[pol]
        )


def test_ssl_pretrained_load_with_lora(torch_and_flax, tmp_path):
    """Regression: `wavlm_pretrained` + use_lora must load via merge_matching.

    The live flagship tree carries LoRA leaves the checkpoint lacks; a strict
    tree.map crashed here, which blocked the documented way of training the
    flagship from real WavLM weights (Phase6 recipe: use_lora=true +
    wavlm_pretrained)."""
    import torch

    from rade_tpu.config import ExperimentConfig
    from rade_tpu.train.loop import Experiment

    hf, _, params_hf = torch_and_flax
    ckpt = tmp_path / "wavlm_tiny.pt"
    torch.save(hf.state_dict(), str(ckpt))

    conf = ExperimentConfig.from_dict({
        "database_path": "", "asv_score_path": "", "model_path": "",
        "batch_size": 2, "num_epochs": 1, "loss": "CCE", "track": "LA",
        "model_config": {
            "architecture": "DualStreamSEMamba", "nb_samp": 3200,
            "emb_size": 16, "num_encoders": 1, "d_state": 4,
            "sinc_channels": 16, "wavlm_variant": "tiny",
            "wavlm_remat": False, "wavlm_freeze_layers": -1,
            "wavlm_pretrained": str(ckpt),
        },
        "optim_config": {"base_lr": 1e-4, "wavlm_lr": 1e-4},
        "training_config": {"use_lora": True},
        "data_config": {}, "test_config": {},
    })
    exp = Experiment(conf, seed=0)
    wl = exp.params["model"]["wavlm_stream"]["model"]
    # pretrained leaves spliced in
    np.testing.assert_allclose(
        np.asarray(wl["feature_projection"]["kernel"]),
        np.asarray(params_hf["feature_projection"]["kernel"]),
        rtol=1e-6, atol=1e-6,
    )
    # LoRA leaves exist and kept their (zero-B) init
    attn = wl["layers_0"]["attention"]
    assert "lora_A_q_proj" in attn
    lora_b = np.concatenate(
        [np.ravel(l) for l in jax.tree.leaves(attn["lora_B_q_proj"])]
    )
    assert float(np.abs(lora_b).max()) == 0.0


def test_ssl_pretrained_missing_path_warns(capsys):
    """A typo'd wavlm_pretrained path must warn, not silently random-init."""
    from rade_tpu.config import ExperimentConfig
    from rade_tpu.train.loop import Experiment

    conf = ExperimentConfig.from_dict({
        "database_path": "", "asv_score_path": "", "model_path": "",
        "batch_size": 2, "num_epochs": 1, "loss": "CCE", "track": "LA",
        "model_config": {
            "architecture": "DualStreamSEMamba", "nb_samp": 3200,
            "emb_size": 16, "num_encoders": 1, "d_state": 4,
            "sinc_channels": 16, "wavlm_variant": "tiny",
            "wavlm_remat": False, "wavlm_freeze_layers": -1,
            "wavlm_pretrained": "/nonexistent/wavlm-large",
        },
        "optim_config": {"base_lr": 1e-4},
        "training_config": {}, "data_config": {}, "test_config": {},
    })
    Experiment(conf, seed=0)
    out = capsys.readouterr().out
    assert "WARNING" in out and "does not exist" in out

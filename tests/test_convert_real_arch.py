"""Pretrained-weight conversion at the REAL operating-point architecture.

The reference's actual frontends are `microsoft/wavlm-large` (24 layers,
1024 hidden, 16 heads, 4096 FFN — `/root/reference/src/models/
DualStreamSEMamba.py:295-317`) and fairseq `xlsr2_300m.pt` (same dims, plain
attention — `/root/reference/models/official/xlsr_mamba_model.py:21-43`).
The tiny-config parity tests (test_wavlm.py, test_xlsr.py) pin the math;
these tests pin the CONVERTERS at the real shapes: random-initialized
full-size checkpoints on disk, zero unmatched / kept-init leaves, and
forward parity on a short waveform (real layer shapes, small time axis).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rade_tpu.nn.wavlm import WavLMConfig, WavLMModel

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

# real wavlm-large / xlsr-300m geometry (shared by both frontends)
LARGE_HF_KW = dict(
    hidden_size=1024,
    num_hidden_layers=24,
    num_attention_heads=16,
    intermediate_size=4096,
    conv_dim=(512,) * 7,
    conv_kernel=(10, 3, 3, 3, 3, 2, 2),
    conv_stride=(5, 2, 2, 2, 2, 2, 2),
    num_feat_extract_layers=7,
    feat_extract_norm="layer",
    conv_bias=True,
    num_conv_pos_embeddings=128,
    num_conv_pos_embedding_groups=16,
    do_stable_layer_norm=True,
    hidden_dropout=0.0,
    activation_dropout=0.0,
    attention_dropout=0.0,
    feat_proj_dropout=0.0,
    layerdrop=0.0,
)

T_IN = 8000  # 0.5 s — real layer shapes, small time axis


def _tree_shapes(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {
        jax.tree_util.keystr(path): tuple(
            leaf.shape if hasattr(leaf, "shape") else np.asarray(leaf).shape
        )
        for path, leaf in flat
    }


def _assert_full_coverage(converted, reference_init):
    """Converted tree must cover the init tree exactly (paths AND shapes)."""
    got = _tree_shapes(converted)
    want = _tree_shapes(reference_init)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"{len(missing)} leaves kept at init: {missing[:8]}"
    assert not extra, f"{len(extra)} unmatched converted leaves: {extra[:8]}"
    bad = [k for k in want if got[k] != want[k]]
    assert not bad, f"shape mismatches: {[(k, got[k], want[k]) for k in bad[:4]]}"


@pytest.mark.parametrize("scan_layers", [False, True])
def test_wavlm_large_conversion_full_shapes(tmp_path, scan_layers):
    from rade_tpu.nn.wavlm_convert import load_pretrained

    torch.manual_seed(0)
    hf_cfg = transformers.WavLMConfig(num_buckets=320, max_bucket_distance=800,
                                      **LARGE_HF_KW)
    hf = transformers.WavLMModel(hf_cfg).eval()
    # scale up random init so activations aren't degenerate
    torch.save(hf.state_dict(), tmp_path / "pytorch_model.bin")

    cfg = WavLMConfig.large(scan_layers=scan_layers)
    params = load_pretrained(str(tmp_path), cfg)

    rng = np.random.RandomState(0)
    x = (rng.randn(1, T_IN) * 0.1).astype(np.float32)

    model = WavLMModel(cfg)
    init_params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, T_IN)), train=False)
    )["params"]
    _assert_full_coverage(params, init_params)

    with torch.no_grad():
        out = hf(torch.tensor(x), output_hidden_states=True)
    last, hidden = model.apply({"params": params}, jnp.asarray(x), train=False)
    assert len(hidden) == 25  # the flagship's 25-layer weighting contract
    np.testing.assert_allclose(
        np.asarray(last), out.last_hidden_state.numpy(), rtol=2e-2, atol=2e-3
    )
    for ours, ref in zip(hidden[::6], list(out.hidden_states)[::6]):
        np.testing.assert_allclose(
            np.asarray(ours), ref.numpy(), rtol=2e-2, atol=2e-3
        )


def _hf_key_to_fairseq(k: str):
    """Inverse of wavlm_convert._fairseq_key_to_hf, for building a synthetic
    full-size fairseq checkpoint from an HF Wav2Vec2 oracle state_dict."""
    import re

    m = re.match(r"feature_extractor\.conv_layers\.(\d+)\.conv\.(.+)", k)
    if m:
        return f"feature_extractor.conv_layers.{m.group(1)}.0.{m.group(2)}"
    m = re.match(r"feature_extractor\.conv_layers\.(\d+)\.layer_norm\.(.+)", k)
    if m:
        return f"feature_extractor.conv_layers.{m.group(1)}.2.1.{m.group(2)}"
    if k.startswith("feature_projection.projection."):
        return "post_extract_proj." + k.rsplit(".", 1)[1]
    if k.startswith("feature_projection.layer_norm."):
        return "layer_norm." + k.rsplit(".", 1)[1]
    if k.startswith("encoder.pos_conv_embed.conv."):
        rest = k.removeprefix("encoder.pos_conv_embed.conv.")
        rest = {
            "parametrizations.weight.original0": "weight_g",
            "parametrizations.weight.original1": "weight_v",
        }.get(rest, rest)
        return "encoder.pos_conv.0." + rest
    m = re.match(r"encoder\.layers\.(\d+)\.(.+)", k)
    if m:
        i, rest = m.groups()
        rest = (
            rest.replace("attention.", "self_attn.")
            .replace("layer_norm", "self_attn_layer_norm")
            .replace("final_self_attn_layer_norm", "final_layer_norm")
            .replace("feed_forward.intermediate_dense", "fc1")
            .replace("feed_forward.output_dense", "fc2")
        )
        return f"encoder.layers.{i}.{rest}"
    if k.startswith("encoder.layer_norm."):
        return k
    return None  # masked_spec_embed etc: no fairseq counterpart


def test_xlsr300m_fairseq_conversion_full_shapes(tmp_path):
    from rade_tpu.nn.wavlm_convert import load_xlsr_checkpoint

    torch.manual_seed(1)
    hf_cfg = transformers.Wav2Vec2Config(**LARGE_HF_KW)
    hf = transformers.Wav2Vec2Model(hf_cfg).eval()

    # synthesize the fairseq checkpoint layout of xlsr2_300m.pt
    fsd = {}
    for k, v in hf.state_dict().items():
        fk = _hf_key_to_fairseq(k)
        if fk is not None:
            fsd[fk] = v
    # fairseq-only pretraining heads the loader must ignore
    fsd["mask_emb"] = torch.zeros(1024)
    fsd["quantizer.vars"] = torch.zeros(1, 640, 384)
    fsd["project_q.weight"] = torch.zeros(768, 768)
    torch.save({"model": fsd, "args": None}, tmp_path / "xlsr2_300m.pt")

    cfg = WavLMConfig.xlsr300m()
    params = load_xlsr_checkpoint(str(tmp_path / "xlsr2_300m.pt"), cfg)

    model = WavLMModel(cfg)
    init_params = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, T_IN)), train=False)
    )["params"]
    _assert_full_coverage(params, init_params)

    rng = np.random.RandomState(1)
    x = (rng.randn(1, T_IN) * 0.1).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.tensor(x), output_hidden_states=True)
    last, hidden = model.apply({"params": params}, jnp.asarray(x), train=False)
    assert len(hidden) == 25
    np.testing.assert_allclose(
        np.asarray(last), out.last_hidden_state.numpy(), rtol=2e-2, atol=2e-3
    )

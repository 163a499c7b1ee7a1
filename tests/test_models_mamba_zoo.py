"""MoEMambaASV / XLSRMamba / DualStreamSEMamba tiny-config smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rade_tpu.registry import build_model

pytestmark = pytest.mark.slow  # jit-compiles model forwards on the CPU mesh


def _run(mc, T):
    model = build_model(mc)
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, T)) * 0.1
    v = model.init({"params": rng, "dropout": rng, "freq_aug": rng}, x, train=False)
    feat, out = model.apply(v, x, train=False)
    (ft, ot), upd = model.apply(
        v, x, train=True, freq_aug=True,
        rngs={"dropout": rng, "freq_aug": rng}, mutable=["batch_stats"],
    )
    return v, feat, out, ot


def test_dual_stream_se_mamba_tiny():
    v, feat, out, ot = _run(
        {"architecture": "DualStreamSEMamba", "emb_size": 24, "num_encoders": 2,
         "d_state": 4, "sinc_channels": 16, "wavlm_variant": "tiny",
         "wavlm_remat": False}, 6000,
    )
    assert feat.shape == (2, 24) and out.shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(ot)))


def test_dual_stream_with_lora_params():
    v, feat, out, _ = _run(
        {"architecture": "DualStreamSEMamba", "emb_size": 24, "num_encoders": 1,
         "d_state": 4, "sinc_channels": 16, "wavlm_variant": "tiny",
         "wavlm_remat": False, "lora_r": 4}, 6000,
    )
    flat = jax.tree_util.tree_flatten_with_path(v["params"])[0]
    lora_leaves = [p for p, _ in flat if any("lora_" in str(k) for k in p)]
    assert lora_leaves  # adapters exist on q/v projections


def test_moe_mamba_tiny():
    v, feat, out, ot = _run(
        {"architecture": "MoEMambaASV", "emb_size": 16, "num_encoders": 2,
         "num_experts": 2, "top_k": 1, "use_sinc_stream": True,
         "sinc_channels": 16, "wavlm_variant": "tiny", "wavlm_remat": False},
        6000,
    )
    assert feat.shape == (2, 16) and out.shape == (2, 2)


def test_xlsr_mamba_tiny():
    v, feat, out, ot = _run(
        {"architecture": "XLSRMamba", "emb_size": 16, "num_encoders": 2,
         "d_state": 4, "wavlm_variant": "tiny", "wavlm_remat": False}, 4800,
    )
    assert feat.shape == (2, 16) and out.shape == (2, 2)


def test_switch_moe_gate_topk():
    from rade_tpu.nn.moe import SwitchGate

    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 5, 8))
    gate = SwitchGate(num_experts=4, top_k=2)
    v = gate.init(rng, x)
    g = np.asarray(gate.apply(v, x))
    # exactly top_k experts active per token, weights sum to ~1
    active = (g > 0).sum(-1)
    assert np.all(active <= 2) and np.all(active >= 1)
    np.testing.assert_allclose(g.sum(-1), 1.0, atol=1e-4)


def test_registry_resolves_all_reference_architectures():
    from rade_tpu.registry import available

    names = available()
    for arch in ["AASIST", "RawNet2Spoof", "RawNetGatSpoofST",
                 "DualStreamSEMamba", "MoEMambaASV", "XLSRMamba"]:
        assert arch in names

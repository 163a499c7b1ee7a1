"""Model zoo smoke tests (tiny shapes — the 1-core CPU is slow to compile)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rade_tpu.registry import available, build_model

pytestmark = pytest.mark.slow  # jit-compiles model forwards on the CPU mesh


def _init_and_forward(model, T, train=False):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(rng, 9), (2, T)) * 0.1
    variables = model.init({"params": rng, "dropout": rng, "freq_aug": rng}, x, train=False)
    if train:
        (feat, out), _ = model.apply(
            variables, x, train=True, freq_aug=True,
            rngs={"dropout": rng, "freq_aug": rng}, mutable=["batch_stats"],
        )
    else:
        feat, out = model.apply(variables, x, train=False)
    return variables, feat, out


def test_registry_lists_models():
    names = available()
    assert "AASIST" in names and "RawNet2Spoof" in names and "RawNetGatSpoofST" in names


def test_aasist_tiny():
    model = build_model({
        "architecture": "AASIST",
        "filts": [16, [1, 4], [4, 4], [4, 4], [4, 4]],
        "gat_dims": [4, 4],
        "pool_ratios": [0.5, 0.7, 0.5, 0.5],
        "temperatures": [2.0, 2.0, 100.0, 100.0],
        "first_conv": 128,
    })
    variables, feat, out = _init_and_forward(model, 4800, train=True)
    assert feat.shape == (2, 5 * 4) and out.shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_aasist_param_count_full_size():
    """Reference AASIST has 297,354 params with the paper config."""
    model = build_model({"architecture": "AASIST"})
    rng = jax.random.PRNGKey(0)
    # init shapes don't depend on T beyond node counts; use short input
    x = jnp.zeros((1, 6000))
    variables = model.init({"params": rng, "dropout": rng, "freq_aug": rng}, x, train=False)
    n = sum(p.size for p in jax.tree.leaves(variables["params"]))
    assert n == 297354


def test_rawnet2_tiny():
    model = build_model({
        "architecture": "RawNet2Spoof",
        "filts": [4, [4, 4], [4, 8], [8, 8]],
        "first_conv": 128,
        "gru_node": 8,
        "nb_gru_layer": 2,
        "nb_fc_node": 8,
        "nb_classes": 2,
    })
    variables, feat, out = _init_and_forward(model, 8000, train=True)
    assert feat.shape == (2, 8) and out.shape == (2, 2)
    # log-softmax output: rows sum to 1 in prob space
    probs = np.exp(np.asarray(out))
    np.testing.assert_allclose(probs.sum(1), 1.0, rtol=1e-5)


def test_rawgat_st_tiny():
    model = build_model({
        "architecture": "RawNetGatSpoofST",
        "filts": [16, [1, 4], [4, 4], [4, 8], [8, 8]],
        "first_conv": 128,
    })
    variables, feat, out = _init_and_forward(model, 6000, train=True)
    assert out.shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_freq_aug_changes_output():
    """Frequency masking must alter the forward result (and be rng-driven)."""
    model = build_model({
        "architecture": "AASIST",
        "filts": [16, [1, 4], [4, 4], [4, 4], [4, 4]],
        "gat_dims": [4, 4],
        "pool_ratios": [0.5, 0.7, 0.5, 0.5],
        "temperatures": [2.0, 2.0, 100.0, 100.0],
        "first_conv": 128,
    })
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 4800))
    variables = model.init({"params": rng, "dropout": rng, "freq_aug": rng}, x, train=False)
    _, out_plain = model.apply(variables, x, train=False)
    # freq_aug with a key that masks >0 bands
    _, out_masked = model.apply(
        variables, x, train=False, freq_aug=True,
        rngs={"freq_aug": jax.random.PRNGKey(3)},
    )
    assert not np.allclose(np.asarray(out_plain), np.asarray(out_masked))


def test_pallas_scan_flag_gated_off_cpu():
    """TPU-only kernel flags must not survive from_config on a CPU backend:
    any shipped .conf (they all set use_pallas_scan) must build and run
    unmodified on CPU — the reference's mock-mamba CPU-check pattern
    (`/root/reference/utils/check_model.py:6-24`), done at the config gate
    instead of by monkeypatching."""
    m = build_model({
        "architecture": "DualStreamSEMamba", "nb_samp": 6000,
        "emb_size": 16, "num_encoders": 1, "d_state": 4,
        "sinc_channels": 16, "wavlm_variant": "tiny",
        "use_pallas_scan": True,
    })
    assert jax.default_backend() == "cpu"  # conftest pins CPU
    assert m.use_pallas_scan is False

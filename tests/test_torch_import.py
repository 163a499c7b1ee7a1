"""Cross-framework checkpoint import: reference torch AASIST -> rade_tpu.

Loads the reference model file as a TEST-ONLY oracle (never imported by
package code), random-initializes it, converts its ``state_dict()`` with
`rade_tpu.tools.import_torch`, and checks end-to-end forward parity on the
same waveforms.  This is the strongest behavioral-parity test we can run
without the ASVspoof dataset: every conv/BN/GAT/pool/readout detail must
match for the logits to agree.
"""

import importlib.util
from pathlib import Path

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rade_tpu.registry import build_model
from rade_tpu.tools.import_torch import convert_aasist, strip_module_prefix

pytestmark = pytest.mark.slow  # jit-compiles model forwards on the CPU mesh

REF = Path("/root/reference/models/AASIST.py")

AASIST_ARGS = {
    "architecture": "AASIST",
    "nb_samp": 64600,
    "first_conv": 128,
    "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
    "gat_dims": [64, 32],
    "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
}


def _load_ref_aasist():
    spec = importlib.util.spec_from_file_location("ref_aasist", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_model():
    if not REF.exists():
        pytest.skip("reference not mounted")
    mod = _load_ref_aasist()
    torch.manual_seed(0)
    model = mod.Model(dict(AASIST_ARGS))
    model.eval()
    return model


def test_state_dict_converts_to_full_param_tree(ref_model):
    params, stats = convert_aasist(ref_model.state_dict())
    model = build_model({"architecture": "AASIST", **AASIST_ARGS})
    import jax

    x = jnp.zeros((1, 16000), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)

    def paths(tree):
        return {
            jax.tree_util.keystr(k)
            for k, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    assert paths(params) == paths(variables["params"])
    assert paths(stats) == paths(variables["batch_stats"])
    key = lambda kv: jax.tree_util.keystr(kv[0])
    for (kp, ours), (_, theirs) in zip(
        sorted(jax.tree_util.tree_flatten_with_path(variables["params"])[0], key=key),
        sorted(jax.tree_util.tree_flatten_with_path(params)[0], key=key),
    ):
        assert ours.shape == np.asarray(theirs).shape, jax.tree_util.keystr(kp)


def test_module_prefix_stripped(ref_model):
    sd = {"module." + k: v for k, v in ref_model.state_dict().items()}
    params, _ = convert_aasist(sd)
    assert "out_layer" in params
    sd2 = strip_module_prefix(sd)
    assert all(not k.startswith("module.") for k in sd2)


def test_forward_parity_with_reference_torch(ref_model):
    """Converted weights produce the same logits as the torch reference."""
    rng = np.random.RandomState(3)
    x = rng.randn(2, 16000).astype(np.float32) * 0.1

    with torch.no_grad():
        hid_t, logit_t = ref_model(torch.tensor(x))

    params, stats = convert_aasist(ref_model.state_dict())
    params = {k: jnp.asarray(v) if not isinstance(v, dict) else v for k, v in params.items()}
    model = build_model({"architecture": "AASIST", **AASIST_ARGS})
    hid_j, logit_j = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x),
        train=False, freq_aug=False,
    )

    np.testing.assert_allclose(
        np.asarray(logit_j), logit_t.numpy(), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(hid_j), hid_t.numpy(), rtol=1e-4, atol=1e-4
    )


# ---------------------------------------------------------------------------
# RawNet2
# ---------------------------------------------------------------------------

RAWNET2_ARGS = {
    "architecture": "RawNet2Spoof",
    "nb_samp": 16000,
    "first_conv": 128,
    "in_channels": 1,
    "filts": [4, [4, 4], [4, 8], [8, 8]],
    "gru_node": 16,
    "nb_gru_layer": 3,
    "nb_fc_node": 16,
    "nb_classes": 2,
}

RAWNET2_REF = Path("/root/reference/models/RawNet2Spoof.py")


@pytest.fixture(scope="module")
def ref_rawnet2():
    if not RAWNET2_REF.exists():
        pytest.skip("reference not mounted")
    spec = importlib.util.spec_from_file_location("ref_rawnet2", RAWNET2_REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(0)
    import copy

    model = mod.Model(copy.deepcopy(RAWNET2_ARGS))  # ctor mutates filts
    model.eval()
    return model


def test_rawnet2_state_dict_converts_to_full_tree(ref_rawnet2):
    import copy

    import jax

    from rade_tpu.tools.import_torch import convert_rawnet2

    params, stats = convert_rawnet2(ref_rawnet2.state_dict())
    model = build_model(copy.deepcopy(RAWNET2_ARGS))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000), jnp.float32))

    def paths(tree):
        return {
            jax.tree_util.keystr(k)
            for k, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    assert paths(params) == paths(variables["params"])
    assert paths(stats) == paths(variables["batch_stats"])


def test_rawnet2_forward_parity(ref_rawnet2):
    import copy

    from rade_tpu.tools.import_torch import convert_rawnet2

    rng = np.random.RandomState(5)
    x = rng.randn(2, 16000).astype(np.float32) * 0.1
    with torch.no_grad():
        hid_t, out_t = ref_rawnet2(torch.tensor(x))

    params, stats = convert_rawnet2(ref_rawnet2.state_dict())
    model = build_model(copy.deepcopy(RAWNET2_ARGS))
    hid_j, out_j = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(hid_j), hid_t.numpy(), rtol=1e-3, atol=1e-3)


# ---------------------------------------------------------------------------
# RawGAT-ST
# ---------------------------------------------------------------------------

RAWGAT_ARGS = {
    "architecture": "RawNetGatSpoofST",
    # the reference hardcodes proj_T(14->12) / proj_S(23->12): 14 pooled
    # spectral nodes (0.64*23) and 23 pooled time nodes (0.81*29), which
    # require the full 64600-sample input
    "nb_samp": 64600,
    "first_conv": 128,
    "filts": [70, [1, 32], [32, 32], [32, 64], [64, 64]],
}

RAWGAT_REF = Path("/root/reference/models/RawNetGatSpoofST.py")


@pytest.fixture(scope="module")
def ref_rawgat():
    if not RAWGAT_REF.exists():
        pytest.skip("reference not mounted")
    spec = importlib.util.spec_from_file_location("ref_rawgat", RAWGAT_REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    torch.manual_seed(0)
    model = mod.Model(dict(RAWGAT_ARGS))
    model.eval()
    return model


def test_rawgat_state_dict_converts_to_full_tree(ref_rawgat):
    import jax

    from rade_tpu.tools.import_torch import convert_rawgat

    params, stats = convert_rawgat(ref_rawgat.state_dict())
    model = build_model(dict(RAWGAT_ARGS))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64600), jnp.float32))

    def paths(tree):
        return {
            jax.tree_util.keystr(k)
            for k, _ in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    assert paths(params) == paths(variables["params"])
    assert paths(stats) == paths(variables["batch_stats"])


def test_rawgat_forward_parity(ref_rawgat):
    from rade_tpu.tools.import_torch import convert_rawgat

    rng = np.random.RandomState(7)
    x = rng.randn(1, 64600).astype(np.float32) * 0.1
    with torch.no_grad():
        hid_t, out_t = ref_rawgat(torch.tensor(x))

    params, stats = convert_rawgat(ref_rawgat.state_dict())
    model = build_model(dict(RAWGAT_ARGS))
    hid_j, out_j = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x), train=False
    )
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(), rtol=1e-3, atol=1e-3)

"""Pipelined WavLM frontend: layout conversion + parity with the module.

The pp layout stacks all N encoder layers (bias table hoisted); the
functional forward (nn/wavlm_pp.py) must reproduce WavLMFrontend.apply
exactly in eval mode, pipelined or not.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rade_tpu.nn.wavlm import WavLMConfig, WavLMFrontend
from rade_tpu.nn.wavlm_pp import (
    from_pp_layout,
    is_pp_layout,
    to_pp_layout,
    wavlm_features_pp,
)
from rade_tpu.parallel import pp
from rade_tpu.parallel.pp import make_mesh_pp


@pytest.fixture(autouse=True)
def _pp_clean():
    yield
    pp.deactivate()


CFG = WavLMConfig.tiny(lora_rank=2)


@pytest.fixture(scope="module")
def frontend():
    model = WavLMFrontend(CFG)
    x = jnp.zeros((2, 1220), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x, train=False,
    )
    return model, variables["params"]


def _pp_params(params):
    return {
        "layer_weights": params["layer_weights"],
        "model": to_pp_layout(params["model"], CFG.num_hidden_layers),
    }


def test_layout_roundtrip(frontend):
    _, params = frontend
    ppp = to_pp_layout(params["model"], CFG.num_hidden_layers)
    assert is_pp_layout(ppp)
    assert "rel_attn_embed" in ppp
    assert "rel_attn_embed" not in jax.tree_util.tree_leaves(
        {"k": list(ppp["layers_pipe"].keys())}
    )
    back = from_pp_layout(ppp, CFG.num_hidden_layers)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        params["model"], back,
    )


def test_functional_matches_module_eval(frontend):
    model, params = frontend
    x = jnp.asarray(np.random.RandomState(0).randn(2, 1220) * 0.1, jnp.float32)
    ref = model.apply({"params": params}, x, train=False)
    got = wavlm_features_pp(_pp_params(params), x, CFG, mesh=None, n_micro=1)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=1e-6
    )


def test_pipelined_matches_sequential(frontend):
    model, params = frontend
    x = jnp.asarray(np.random.RandomState(1).randn(4, 1220) * 0.1, jnp.float32)
    p = _pp_params(params)
    seq = wavlm_features_pp(p, x, CFG, mesh=None, n_micro=2)
    mesh = make_mesh_pp(2, 2)
    piped = wavlm_features_pp(p, x, CFG, mesh=mesh, n_micro=2)
    np.testing.assert_allclose(
        np.asarray(piped), np.asarray(seq), rtol=2e-5, atol=1e-6
    )


@pytest.mark.slow
def test_pipelined_gradients_match(frontend):
    model, params = frontend
    x = jnp.asarray(np.random.RandomState(2).randn(4, 1220) * 0.1, jnp.float32)
    p = _pp_params(params)
    mesh = make_mesh_pp(2, 2)

    def loss(p, mesh):
        return jnp.sum(
            wavlm_features_pp(p, x, CFG, mesh=mesh, n_micro=2) ** 2
        )

    g_seq = jax.grad(lambda q: loss(q, None))(p)
    g_pp = jax.grad(lambda q: loss(q, mesh))(p)
    flat_s, _ = jax.tree_util.tree_flatten_with_path(g_seq)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_pp)
    for (path, a), (_, b) in zip(flat_s, flat_p):
        # atol covers k_proj-bias grads, which are mathematically zero
        # (softmax is invariant to a per-query constant logit shift) and
        # show only float cancellation noise
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=5e-6,
            err_msg=jax.tree_util.keystr(path),
        )


def test_train_mode_runs_with_dropout(frontend):
    _, params = frontend
    x = jnp.asarray(np.random.RandomState(3).randn(4, 1220) * 0.1, jnp.float32)
    p = _pp_params(params)
    mesh = make_mesh_pp(2, 2)
    out = wavlm_features_pp(
        p, x, CFG, mesh=mesh, n_micro=2, train=True, rng=jax.random.PRNGKey(5)
    )
    assert np.isfinite(np.asarray(out)).all()
    # same key, sequential: identical masks (schedule-independent rng)
    out_seq = wavlm_features_pp(
        p, x, CFG, mesh=None, n_micro=2, train=True, rng=jax.random.PRNGKey(5)
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_seq), rtol=2e-5, atol=1e-6
    )

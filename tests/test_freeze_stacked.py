"""Phase-4-style bottom-N layer freezing under the STACKED layouts.

The reference freezes the bottom N WavLM encoder layers with
`requires_grad=False` (`/root/reference/src/models/DualStreamSEMamba.py:
338-370`, N=18 in Phase 4).  Under the unrolled layout that maps to per-leaf
0/1 masks; under scan/pipeline layouts layers live stacked in one leaf, so
the mask carries a per-layer 0/1 LANE on the leading layer axis
(`make_trainable_mask(stacked_layer_freeze=...)`).  These tests pin:

- mask parity: the stacked vector mask encodes exactly the unrolled mask;
- end-to-end: a train step under scan layout moves only unfrozen layers;
- pipeline layout: same, through the GPipe executor.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rade_tpu.config import ExperimentConfig
from rade_tpu.parallel import pp
from rade_tpu.parallel.pp import make_mesh_pp
from rade_tpu.parallel.sp import deactivate as sp_deactivate
from rade_tpu.train.loop import Experiment


@pytest.fixture(autouse=True)
def _clean():
    yield
    pp.deactivate()
    sp_deactivate()


def _cfg(n_freeze, scan=False, pipeline_axis=1, num_layers=None):
    mc = {
        "architecture": "DualStreamSEMamba", "nb_samp": 6020,
        "emb_size": 16, "num_encoders": 1, "d_state": 4,
        "sinc_channels": 16, "wavlm_variant": "tiny",
        "wavlm_remat": False, "wavlm_freeze_layers": n_freeze,
        "wavlm_scan_layers": scan,
    }
    if num_layers is not None:
        mc["wavlm_num_hidden_layers"] = num_layers
    d = {
        "database_path": "", "asv_score_path": "", "model_path": "",
        "batch_size": 4, "num_epochs": 1, "loss": "CCE", "track": "LA",
        "model_config": mc,
        "optim_config": {"base_lr": 1e-2, "wavlm_lr": 1e-3,
                         "scheduler": "cosine",
                         "scheduler_config": {"eta_min": 1e-6}},
        # Phase-4 recipe shape: NO LoRA, bottom-N freeze, full FT of the top
        "training_config": {"use_mixup": False, "use_ema": True,
                            "use_lora": False, "accumulation_steps": 1,
                            "warmup_ratio": 0.0, "use_fgm": False},
        "test_config": {"batch_size": 4},
    }
    if pipeline_axis > 1:
        d["parallel_config"] = {
            "pipeline_axis": pipeline_axis, "pipeline_microbatches": 2,
        }
    return ExperimentConfig.from_dict(d)


def _leaf_changed(a, b):
    return not np.allclose(np.asarray(a), np.asarray(b))


def _any_changed(tree_a, tree_b):
    return any(
        _leaf_changed(a, b)
        for a, b in zip(jax.tree.leaves(tree_a), jax.tree.leaves(tree_b))
    )


def _train_one_step(exp, cfg):
    state = exp.setup_training(steps_per_epoch=2)
    rng = np.random.RandomState(0)
    T = int(cfg.model_config["nb_samp"])
    xs = jnp.asarray(rng.randn(1, 4, T).astype(np.float32) * 0.1)
    ys = jnp.asarray(rng.randint(0, 2, (1, 4)).astype(np.int32))
    before = jax.device_get(state.params)
    state, metrics = exp.train_step(state, xs, ys)
    after = jax.device_get(state.params)
    assert np.isfinite(float(metrics["loss"]))
    return before["model"]["wavlm_stream"]["model"], after["model"]["wavlm_stream"]["model"]


@pytest.mark.slow
def test_scan_layout_freeze_mask_is_per_layer_vector():
    cfg = _cfg(n_freeze=1, scan=True)
    exp = Experiment(cfg, seed=0)
    wl_mask = exp.trainable_mask["model"]["wavlm_stream"]["model"]
    # stacked lane: tiny model has 2 layers -> layers_scan holds layer 1 only
    vec_leaves = jax.tree.leaves(wl_mask["layers_scan"])
    assert all(np.ndim(v) >= 1 and np.asarray(v).reshape(-1)[0] == 1.0 for v in vec_leaves)
    # layer 0 + extractor + projection frozen scalars
    assert all(float(np.max(m)) == 0.0 for m in jax.tree.leaves(wl_mask["layers_0"]))
    assert all(
        float(np.max(m)) == 0.0
        for m in jax.tree.leaves(wl_mask["feature_extractor"])
    )


@pytest.mark.slow
def test_scan_layout_freeze_trains_only_unfrozen_layers():
    cfg = _cfg(n_freeze=1, scan=True)
    exp = Experiment(cfg, seed=0)
    before, after = _train_one_step(exp, cfg)
    # frozen: layer 0, extractor, projection — bit-identical after the step
    for sub in ("layers_0", "feature_extractor", "feature_projection"):
        assert not _any_changed(before[sub], after[sub]), f"{sub} moved"
    # trainable: the stacked layer-1 lane moved
    assert _any_changed(before["layers_scan"], after["layers_scan"])


def test_scan_freeze_mask_matches_unrolled_semantics():
    """The stacked vector mask must encode exactly the unrolled mask."""
    from rade_tpu.nn.wavlm import unstack_layer_params

    cfg_s = _cfg(n_freeze=1, scan=True)
    exp_s = Experiment(cfg_s, seed=0)
    cfg_u = _cfg(n_freeze=1, scan=False)
    exp_u = Experiment(cfg_u, seed=0)
    wl_s = exp_s.trainable_mask["model"]["wavlm_stream"]["model"]
    wl_u = exp_u.trainable_mask["model"]["wavlm_stream"]["model"]
    n_layers = 2
    # broadcast the stacked mask to full leaves, unstack, compare per layer
    params_s = exp_s.params["model"]["wavlm_stream"]["model"]
    full = jax.tree.map(
        lambda m, p: np.broadcast_to(np.asarray(m, np.float32), np.shape(p)),
        wl_s, params_s,
    )
    unstacked = unstack_layer_params(full, n_layers)
    for i in range(n_layers):
        got = {
            k: float(np.max(v)) for k, v in
            ((jax.tree_util.keystr(pth), leaf) for pth, leaf in
             jax.tree_util.tree_flatten_with_path(unstacked[f"layers_{i}"])[0])
        }
        want = {
            k: float(np.max(v)) for k, v in
            ((jax.tree_util.keystr(pth), leaf) for pth, leaf in
             jax.tree_util.tree_flatten_with_path(wl_u[f"layers_{i}"])[0])
        }
        assert got == want, f"layer {i} mask mismatch"


@pytest.mark.slow
def test_pp_layout_freeze_trains_only_unfrozen_layers():
    cfg = _cfg(n_freeze=1, pipeline_axis=2)
    exp = Experiment(cfg, seed=0, mesh=make_mesh_pp(1, 2))
    wl_mask = exp.trainable_mask["model"]["wavlm_stream"]["model"]
    vec = np.asarray(jax.tree.leaves(wl_mask["layers_pipe"])[0]).reshape(-1)
    np.testing.assert_array_equal(vec, [0.0, 1.0])
    # hoisted rel_attn_embed belongs to frozen layer 0
    assert float(np.max(wl_mask["rel_attn_embed"])) == 0.0

    before, after = _train_one_step(exp, cfg)
    stacked_b = before["layers_pipe"]
    stacked_a = after["layers_pipe"]
    for b, a in zip(jax.tree.leaves(stacked_b), jax.tree.leaves(stacked_a)):
        np.testing.assert_array_equal(
            np.asarray(b)[0], np.asarray(a)[0]
        )  # layer 0 lane frozen
    assert _any_changed(
        [np.asarray(x)[1] for x in jax.tree.leaves(stacked_b)],
        [np.asarray(x)[1] for x in jax.tree.leaves(stacked_a)],
    )
    assert not _any_changed(before["feature_extractor"], after["feature_extractor"])

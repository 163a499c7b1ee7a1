"""Freezing semantics (WavLM layers, LoRA, sincnet) and FGM behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rade_tpu.config import ExperimentConfig
from rade_tpu.parallel.mesh import DATA_AXIS, make_mesh
from rade_tpu.train.loop import Experiment

pytestmark = pytest.mark.slow  # compiles full train steps on the CPU mesh


def _conf(training=None, model=None):
    return ExperimentConfig.from_dict({
        "database_path": "", "asv_score_path": "", "model_path": "",
        "batch_size": 4, "num_epochs": 1, "loss": "CCE", "track": "LA",
        "model_config": {
            "architecture": "DualStreamSEMamba", "nb_samp": 6000,
            "emb_size": 16, "num_encoders": 1, "d_state": 4,
            "sinc_channels": 16, "wavlm_variant": "tiny", "wavlm_remat": False,
            "wavlm_freeze_layers": -1, **(model or {}),
        },
        "optim_config": {"base_lr": 1e-2, "wavlm_lr": 1e-3,
                         "scheduler": "cosine", "scheduler_config": {"eta_min": 1e-6}},
        "training_config": {"use_mixup": False, "use_ema": False,
                            "accumulation_steps": 1, "warmup_ratio": 0.0,
                            **(training or {})},
        "test_config": {"batch_size": 4},
    })


def _leaf(params, *path):
    node = params
    for p in path:
        node = node[p]
    return np.asarray(node)


def _one_step(cfg, seed=3):
    mesh = make_mesh(1)
    exp = Experiment(cfg, seed=seed, mesh=mesh)
    before = jax.device_get(exp.params)
    exp.setup_training(steps_per_epoch=2)
    rng = np.random.RandomState(0)
    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    xs = jax.device_put(rng.randn(1, 4, 6000).astype(np.float32) * 0.1, sh)
    ys = jax.device_put(rng.randint(0, 2, (1, 4)).astype(np.int32), sh)
    exp.state, m = exp.train_step(exp.state, xs, ys)
    return before, jax.device_get(exp.state.params), float(m["loss"])


def test_lora_freezes_wavlm_base_but_trains_adapters():
    cfg = _conf(training={"use_lora": True})
    before, after, loss = _one_step(cfg)
    base_b = _leaf(before["model"], "wavlm_stream", "model", "layers_0",
                   "attention", "q_proj", "kernel")
    base_a = _leaf(after["model"], "wavlm_stream", "model", "layers_0",
                   "attention", "q_proj", "kernel")
    np.testing.assert_array_equal(base_a, base_b)  # frozen base
    lora_b = _leaf(before["model"], "wavlm_stream", "model", "layers_0",
                   "attention", "lora_B_q_proj")
    lora_a = _leaf(after["model"], "wavlm_stream", "model", "layers_0",
                   "attention", "lora_B_q_proj")
    assert not np.array_equal(lora_a, lora_b)  # adapters move
    lw_b = _leaf(before["model"], "wavlm_stream", "layer_weights")
    lw_a = _leaf(after["model"], "wavlm_stream", "layer_weights")
    assert not np.array_equal(lw_a, lw_b)  # layer weighting always trains
    assert np.isfinite(loss)


def test_freeze_layers_policy():
    cfg = _conf(model={"wavlm_freeze_layers": 1})
    before, after, _ = _one_step(cfg)
    l0_b = _leaf(before["model"], "wavlm_stream", "model", "layers_0",
                 "attention", "q_proj", "kernel")
    l0_a = _leaf(after["model"], "wavlm_stream", "model", "layers_0",
                 "attention", "q_proj", "kernel")
    np.testing.assert_array_equal(l0_a, l0_b)  # layer 0 frozen
    l1_b = _leaf(before["model"], "wavlm_stream", "model", "layers_1",
                 "attention", "q_proj", "kernel")
    l1_a = _leaf(after["model"], "wavlm_stream", "model", "layers_1",
                 "attention", "q_proj", "kernel")
    assert not np.array_equal(l1_a, l1_b)  # layer 1 trains
    fe_b = _leaf(before["model"], "wavlm_stream", "model", "feature_projection", "kernel")
    fe_a = _leaf(after["model"], "wavlm_stream", "model", "feature_projection", "kernel")
    np.testing.assert_array_equal(fe_a, fe_b)  # projection always frozen


def test_freeze_sincnet():
    cfg = _conf(training={"freeze_sincnet": True}, model={"wavlm_freeze_layers": -1})
    before, after, _ = _one_step(cfg)
    s_b = _leaf(before["model"], "sinc_stream", "encoder_0", "conv1", "kernel")
    s_a = _leaf(after["model"], "sinc_stream", "encoder_0", "conv1", "kernel")
    np.testing.assert_array_equal(s_a, s_b)


def test_fgm_changes_the_update():
    cfg_plain = _conf()
    cfg_fgm = _conf(training={"use_fgm": True, "fgm_epsilon": 0.5,
                              "fgm_emb_name": "feature_projection"})
    _, after_plain, loss_p = _one_step(cfg_plain, seed=4)
    _, after_fgm, loss_f = _one_step(cfg_fgm, seed=4)
    head_p = _leaf(after_plain["model"], "classifier", "kernel")
    head_f = _leaf(after_fgm["model"], "classifier", "kernel")
    assert not np.array_equal(head_p, head_f)  # adversarial grads folded in
    assert np.isfinite(loss_f) and loss_f >= loss_p * 0.5  # fgm loss includes 2nd pass


def test_fgm_shared_frontend_matches_unshared():
    """fgm_share_frontend computes the sinc stream once for both FGM passes;
    the update must be IDENTICAL to the two-pass recompute (VJP linearity) —
    freq_aug off so there is no second mask draw to replay."""
    t = {"use_fgm": True, "fgm_epsilon": 0.5, "freeze_bn": True,
         "use_mixup": True, "mixup_alpha": 1.0}
    _, after_s, loss_s = _one_step(_conf(training={**t, "fgm_share_frontend": True}), seed=7)
    _, after_u, loss_u = _one_step(_conf(training={**t, "fgm_share_frontend": False}), seed=7)
    assert abs(loss_s - loss_u) < 1e-5 * max(1.0, abs(loss_u))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(after_s),
        jax.tree_util.tree_leaves_with_path(after_u),
    ):
        assert pa == pb
        # cotangents summed before ONE backward vs two backwards then summed:
        # same math, different float association -> tiny reassociation noise
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-5, err_msg=str(pa))


def test_fgm_shared_frontend_disabled_under_freq_aug():
    """With freq_aug ON the reference re-draws the sinc filter-band mask in
    the FGM second forward (`src/main.py:1087` -> `AASIST.py:391-396`), so
    frontend sharing must NOT engage: flag on and off must be bit-identical
    (both take the two-pass path with a fresh mask draw)."""
    import json

    t = {"use_fgm": True, "fgm_epsilon": 0.5, "freeze_bn": True}

    def _cfg(share):
        d = json.loads(json.dumps({
            "database_path": "", "asv_score_path": "", "model_path": "",
            "batch_size": 4, "num_epochs": 1, "loss": "CCE", "track": "LA",
            "freq_aug": "True",
            "model_config": {
                "architecture": "DualStreamSEMamba", "nb_samp": 6000,
                "emb_size": 16, "num_encoders": 1, "d_state": 4,
                "sinc_channels": 16, "wavlm_variant": "tiny",
                "wavlm_remat": False, "wavlm_freeze_layers": -1,
            },
            "optim_config": {"base_lr": 1e-2, "wavlm_lr": 1e-3,
                             "scheduler": "cosine",
                             "scheduler_config": {"eta_min": 1e-6}},
            "training_config": {"use_mixup": False, "use_ema": False,
                                "accumulation_steps": 1, "warmup_ratio": 0.0,
                                **t, "fgm_share_frontend": share},
            "test_config": {"batch_size": 4},
        }))
        return ExperimentConfig.from_dict(d)

    _, after_s, loss_s = _one_step(_cfg(True), seed=9)
    _, after_u, loss_u = _one_step(_cfg(False), seed=9)
    assert loss_s == loss_u
    for a, b in zip(jax.tree_util.tree_leaves(after_s),
                    jax.tree_util.tree_leaves(after_u)):
        np.testing.assert_array_equal(a, b)


def test_fgm_shared_extractor_matches_unshared():
    """fgm_share_extractor computes the frozen WavLM CNN extractor once and
    feeds BOTH FGM passes.  The extractor is deterministic (no dropout) and
    upstream of the perturbed feature_projection, so the step must be
    numerically identical with the flag on or off — including under freq_aug
    (the filter-band mask only touches the sinc stream)."""
    t = {"use_fgm": True, "fgm_epsilon": 0.5, "freeze_bn": True,
         "use_mixup": True, "mixup_alpha": 1.0,
         # isolate extractor sharing from the sinc-frontend sharing path
         "fgm_share_frontend": False}
    _, after_s, loss_s = _one_step(
        _conf(training={**t, "fgm_share_extractor": True}), seed=5)
    _, after_u, loss_u = _one_step(
        _conf(training={**t, "fgm_share_extractor": False}), seed=5)
    assert abs(loss_s - loss_u) < 1e-5 * max(1.0, abs(loss_u))
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(after_s),
        jax.tree_util.tree_leaves_with_path(after_u),
    ):
        assert pa == pb
        # same ops on the same values; XLA may fuse the standalone extractor
        # apply differently -> allow reassociation-level noise only
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6, err_msg=str(pa))


def test_fgm_shared_extractor_requires_frozen_extractor():
    """Sharing must disengage when the extractor subtree is trainable (the
    perturbed pass would otherwise silently reuse stale activations).  An
    fgm_emb_name that selects extractor leaves makes them trainable
    (reference main.py:516-544 semantics) AND perturbed, so the gate must
    refuse; the step then matches the unshared path bit-for-bit."""
    t = {"use_fgm": True, "fgm_epsilon": 0.5, "freeze_bn": True,
         "fgm_emb_name": "feature_extractor", "fgm_share_frontend": False}
    _, after_s, loss_s = _one_step(
        _conf(training={**t, "fgm_share_extractor": True}), seed=6)
    _, after_u, loss_u = _one_step(
        _conf(training={**t, "fgm_share_extractor": False}), seed=6)
    assert loss_s == loss_u
    for a, b in zip(jax.tree_util.tree_leaves(after_s),
                    jax.tree_util.tree_leaves(after_u)):
        np.testing.assert_array_equal(a, b)

"""Pipeline parallelism integrated in the trainer: layout conversion,
eval parity with the module path, and pipelined == sequential train steps
(including the FGM double backward through the pipeline).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rade_tpu.config import ExperimentConfig
from rade_tpu.parallel import pp
from rade_tpu.parallel.mesh import DATA_AXIS, make_mesh
from rade_tpu.parallel.pp import make_mesh_pp
from rade_tpu.parallel.sp import deactivate as sp_deactivate
from rade_tpu.train.loop import Experiment


@pytest.fixture(autouse=True)
def _clean():
    yield
    pp.deactivate()
    sp_deactivate()


def _cfg(pipeline_axis=1, use_fgm=False):
    return ExperimentConfig.from_dict({
        "database_path": "", "asv_score_path": "", "model_path": "",
        "batch_size": 4, "num_epochs": 1, "loss": "CCE", "track": "LA",
        "model_config": {
            "architecture": "DualStreamSEMamba", "nb_samp": 6020,
            "emb_size": 16, "num_encoders": 1, "d_state": 4,
            "sinc_channels": 16, "wavlm_variant": "tiny",
            "wavlm_remat": False, "wavlm_freeze_layers": -1,
        },
        "optim_config": {"base_lr": 1e-2, "wavlm_lr": 1e-3,
                         "scheduler": "cosine",
                         "scheduler_config": {"eta_min": 1e-6}},
        "training_config": {"use_mixup": False, "use_ema": True,
                            "use_lora": True, "accumulation_steps": 1,
                            "warmup_ratio": 0.0, "use_fgm": use_fgm,
                            "fgm_epsilon": 0.5,
                            "fgm_emb_name": "feature_projection"},
        "parallel_config": {"pipeline_axis": pipeline_axis,
                            "pipeline_microbatches": 2},
        "test_config": {"batch_size": 4},
    })


def test_experiment_converts_to_pp_layout():
    exp = Experiment(_cfg(pipeline_axis=2), seed=1, mesh=make_mesh_pp(1, 2))
    wl = exp.params["model"]["wavlm_stream"]["model"]
    assert "layers_pipe" in wl and "rel_attn_embed" in wl
    assert "layers_0" not in wl
    # trainable mask was rebuilt for the converted structure
    jax.tree_util.tree_map(lambda *_: None, exp.trainable_mask, exp.params)


def test_pp_eval_scores_match_module_path():
    """Same seed => same init weights; the pp functional eval path must
    score identically to the unrolled module path."""
    x = np.random.RandomState(0).randn(4, 6020).astype(np.float32) * 0.1

    ref = Experiment(_cfg(pipeline_axis=1), seed=2, mesh=make_mesh(1))
    s_ref = np.asarray(ref.eval_step(ref.params, ref.batch_stats, jnp.asarray(x)))

    exp = Experiment(_cfg(pipeline_axis=2), seed=2, mesh=make_mesh_pp(1, 2))
    s_pp = np.asarray(exp.eval_step(exp.params, exp.batch_stats, jnp.asarray(x)))
    np.testing.assert_allclose(s_pp, s_ref, rtol=2e-4, atol=1e-6)


def test_layout_converters_roundtrip():
    """unrolled -> pp -> unrolled and unrolled -> scan -> pp -> unrolled
    are exact (nn/wavlm_pp.py::convert_layout via the unrolled hub)."""
    from rade_tpu.nn.wavlm import WavLMConfig, WavLMModel
    from rade_tpu.nn.wavlm_pp import convert_layout, detect_layout

    cfg = WavLMConfig.tiny()
    x = jnp.zeros((1, 6020), jnp.float32)
    p = WavLMModel(cfg).init({"params": jax.random.PRNGKey(0)}, x, False)[
        "params"
    ]
    assert detect_layout(p) == "unrolled"
    pp_p = convert_layout(p, "pp")
    assert detect_layout(pp_p) == "pp"
    scan_p = convert_layout(pp_p, "scan")
    assert detect_layout(scan_p) == "scan"
    back = convert_layout(convert_layout(scan_p, "pp"), "unrolled")
    jax.tree.map(np.testing.assert_array_equal, back, p)


def test_eval_weights_bridge_unrolled_to_pp(tmp_path):
    """An unrolled-run checkpoint scores under a pipeline-parallel config:
    load_eval_weights bridges the encoder layout (checkpoint.py)."""
    from rade_tpu.train.checkpoint import load_eval_weights, save_state

    ref = Experiment(_cfg(pipeline_axis=1), seed=2, mesh=make_mesh(1))
    path = tmp_path / "best"
    save_state(
        path,
        {
            "model": ref.params["model"],
            "loss": ref.params["loss"],
            "batch_stats": ref.batch_stats,
        },
    )

    exp = Experiment(_cfg(pipeline_axis=2), seed=2, mesh=make_mesh_pp(1, 2))
    loaded, stats = load_eval_weights(
        path,
        {"model": exp.params["model"], "loss": exp.params["loss"]},
        exp.batch_stats,
    )
    # same seed => the bridged unrolled weights equal the pp-converted init
    jax.tree.map(
        np.testing.assert_array_equal, loaded["model"], exp.params["model"]
    )
    jax.tree.map(np.testing.assert_array_equal, stats, exp.batch_stats)


@pytest.mark.slow
def test_pp_train_step_matches_sequential_fallback():
    """One FGM train step pipelined over (1, 2, 1) reproduces the pp-layout
    sequential fallback on one device (same layout, same rng folds)."""
    rng = np.random.RandomState(0)
    xs = rng.randn(1, 4, 6020).astype(np.float32) * 0.1
    ys = rng.randint(0, 2, (1, 4)).astype(np.int32)

    def run(mesh):
        exp = Experiment(_cfg(pipeline_axis=2, use_fgm=True), seed=3, mesh=mesh)
        exp.setup_training(steps_per_epoch=2)
        bs = NamedSharding(mesh, P(None, DATA_AXIS))
        state, m = exp.train_step(
            exp.state, jax.device_put(xs, bs), jax.device_put(ys, bs)
        )
        wl = state.params["model"]["wavlm_stream"]["model"]
        q = wl["layers_pipe"]["attention"]["lora_B_q_proj"]
        fp = wl["feature_projection"]["kernel"]  # FGM target moved
        lw = state.params["model"]["wavlm_stream"]["layer_weights"]
        return (
            float(m["loss"]), jax.device_get(q),
            jax.device_get(fp), jax.device_get(lw),
        )

    loss_pp, q_pp, fp_pp, lw_pp = run(make_mesh_pp(1, 2))
    loss_1, q_1, fp_1, lw_1 = run(make_mesh(1))
    assert loss_pp == pytest.approx(loss_1, rel=1e-4)
    np.testing.assert_allclose(q_pp, q_1, rtol=1e-3, atol=1e-7)
    np.testing.assert_allclose(fp_pp, fp_1, rtol=1e-3, atol=1e-7)
    np.testing.assert_allclose(lw_pp, lw_1, rtol=1e-4, atol=1e-7)

"""bf16 mixed-precision train/eval path tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rade_tpu.config import ExperimentConfig
from rade_tpu.parallel.mesh import make_mesh
from rade_tpu.train.step import cast_tree

pytestmark = pytest.mark.slow  # compiles full train steps on the CPU mesh


def _tiny_conf(**training_overrides):
    conf = {
        "database_path": "", "asv_score_path": "", "model_path": "",
        "batch_size": 4, "num_epochs": 1, "loss": "CCE", "track": "LA",
        "model_config": {
            "architecture": "AASIST", "nb_samp": 4800, "first_conv": 128,
            "filts": [16, [1, 4], [4, 4], [4, 4], [4, 4]],
            "gat_dims": [4, 4], "pool_ratios": [0.5, 0.7, 0.5, 0.5],
            "temperatures": [2.0, 2.0, 100.0, 100.0],
        },
        "optim_config": {"base_lr": 1e-3, "scheduler": "cosine",
                         "scheduler_config": {"eta_min": 1e-6}},
        "training_config": {"use_mixup": False, "use_ema": False,
                            "accumulation_steps": 1, "warmup_ratio": 0.0,
                            **training_overrides},
        "test_config": {"batch_size": 4},
    }
    return ExperimentConfig.from_dict(conf)


def test_cast_tree_only_touches_floats():
    tree = {"w": jnp.ones(3, jnp.float32), "i": jnp.ones(3, jnp.int32)}
    out = cast_tree(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["i"].dtype == jnp.int32


def test_bf16_train_step_keeps_master_weights_f32():
    from rade_tpu.train.loop import Experiment

    cfg = _tiny_conf(mixed_precision=True)
    assert cfg.training.mixed_precision
    exp = Experiment(cfg, seed=2, mesh=make_mesh(1))
    state = exp.setup_training(steps_per_epoch=2)
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(1, 4, 4800).astype(np.float32) * 0.1)
    ys = jnp.asarray(rng.randint(0, 2, (1, 4)).astype(np.int32))
    state, metrics = exp.train_step(state, xs, ys)
    assert np.isfinite(float(metrics["loss"]))
    # master weights stay f32
    for leaf in jax.tree.leaves(state.params):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32


def test_bf16_eval_scores_close_to_f32():
    from rade_tpu.train.loop import Experiment

    cfg32 = _tiny_conf(mixed_precision=False)
    cfg16 = _tiny_conf(mixed_precision=True)
    exp32 = Experiment(cfg32, seed=3, mesh=make_mesh(1))
    exp16 = Experiment(cfg16, seed=3, mesh=make_mesh(1))
    # same init (same seed) -> same params
    x = jnp.asarray(np.random.RandomState(1).randn(4, 4800).astype(np.float32) * 0.1)
    s32 = np.asarray(exp32.eval_step(exp32.params, exp32.batch_stats, x))
    s16 = np.asarray(exp16.eval_step(exp16.params, exp16.batch_stats, x))
    assert s16.dtype == np.float32
    np.testing.assert_allclose(s16, s32, rtol=0.1, atol=0.15)

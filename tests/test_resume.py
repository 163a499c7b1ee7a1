"""Resume-from-checkpoint continuation test (full-state restore)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from rade_tpu.config import ExperimentConfig
from rade_tpu.parallel.mesh import DATA_AXIS, make_mesh
from rade_tpu.train.checkpoint import restore_state, save_state
from rade_tpu.train.loop import Experiment

pytestmark = pytest.mark.slow  # compiles full train steps on the CPU mesh


def _cfg():
    return ExperimentConfig.from_dict({
        "database_path": "", "asv_score_path": "", "model_path": "",
        "batch_size": 4, "num_epochs": 2, "loss": "CCE", "track": "LA",
        "model_config": {
            "architecture": "AASIST", "nb_samp": 4800, "first_conv": 128,
            "filts": [16, [1, 4], [4, 4], [4, 4], [4, 4]],
            "gat_dims": [4, 4], "pool_ratios": [0.5, 0.7, 0.5, 0.5],
            "temperatures": [2.0, 2.0, 100.0, 100.0],
        },
        "optim_config": {"base_lr": 1e-3, "scheduler": "cosine",
                         "scheduler_config": {"eta_min": 1e-6}},
        "training_config": {"use_mixup": False, "use_ema": True,
                            "accumulation_steps": 1, "warmup_ratio": 0.0},
        "test_config": {"batch_size": 4},
    })


def test_full_state_resume_matches_uninterrupted(tmp_path):
    cfg = _cfg()
    mesh = make_mesh(1)
    rng = np.random.RandomState(0)
    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    batches = [
        (rng.randn(1, 4, 4800).astype(np.float32) * 0.1,
         rng.randint(0, 2, (1, 4)).astype(np.int32))
        for _ in range(3)
    ]

    def fresh():
        exp = Experiment(cfg, seed=9, mesh=mesh)
        exp.setup_training(steps_per_epoch=3)
        return exp

    # run A: 3 steps straight
    exp_a = fresh()
    for xb, yb in batches:
        exp_a.state, _ = exp_a.train_step(
            exp_a.state, jax.device_put(xb, sh), jax.device_put(yb, sh)
        )
    leaf_a = np.asarray(jax.tree.leaves(exp_a.state.params)[0])

    # run B: 1 step, checkpoint, restore into a fresh experiment, 2 more steps
    exp_b = fresh()
    exp_b.state, _ = exp_b.train_step(
        exp_b.state, jax.device_put(batches[0][0], sh), jax.device_put(batches[0][1], sh)
    )
    ckpt = tmp_path / "mid.ckpt"
    save_state(ckpt, exp_b.state)

    exp_c = fresh()
    exp_c.state = restore_state(ckpt, exp_c.state)
    assert int(jax.device_get(exp_c.state.step)) == 1
    for xb, yb in batches[1:]:
        exp_c.state, _ = exp_c.train_step(
            exp_c.state, jax.device_put(xb, sh), jax.device_put(yb, sh)
        )
    leaf_c = np.asarray(jax.tree.leaves(exp_c.state.params)[0])

    np.testing.assert_allclose(leaf_c, leaf_a, rtol=1e-5, atol=1e-7)
    assert int(jax.device_get(exp_c.state.step)) == 3


def test_load_eval_weights_from_full_train_state(tmp_path):
    """--eval must accept trainer-written full-state checkpoints, preferring
    EMA parameters (the reference scores dev/eval with the EMA model)."""
    from rade_tpu.train.checkpoint import load_eval_weights

    cfg = _cfg()
    mesh = make_mesh(1)
    exp = Experiment(cfg, seed=9, mesh=mesh)
    exp.setup_training(steps_per_epoch=3)
    rng = np.random.RandomState(1)
    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    xb = jax.device_put(rng.randn(1, 4, 4800).astype(np.float32) * 0.1, sh)
    yb = jax.device_put(rng.randint(0, 2, (1, 4)).astype(np.int32), sh)
    exp.state, _ = exp.train_step(exp.state, xb, yb)
    ckpt = tmp_path / "full.ckpt"
    save_state(ckpt, exp.state)

    params_tmpl = {"model": exp.params["model"], "loss": exp.params["loss"]}
    params, batch_stats = load_eval_weights(ckpt, params_tmpl, exp.batch_stats)

    leaf_got = np.asarray(jax.tree.leaves(params["model"])[0])
    leaf_ema = np.asarray(jax.tree.leaves(exp.state.ema_params["model"])[0])
    np.testing.assert_array_equal(leaf_got, leaf_ema)
    sg = np.asarray(jax.tree.leaves(batch_stats)[0])
    st = np.asarray(jax.tree.leaves(jax.device_get(exp.state.batch_stats))[0])
    np.testing.assert_array_equal(sg, st)


def test_load_eval_weights_from_reduced_tree(tmp_path):
    from rade_tpu.train.checkpoint import load_eval_weights

    cfg = _cfg()
    exp = Experiment(cfg, seed=3, mesh=make_mesh(1))
    tree = {"model": exp.params["model"], "loss": exp.params["loss"],
            "batch_stats": exp.batch_stats}
    ckpt = tmp_path / "reduced.ckpt"
    save_state(ckpt, tree)
    params_tmpl = {"model": exp.params["model"], "loss": exp.params["loss"]}
    params, stats = load_eval_weights(ckpt, params_tmpl, exp.batch_stats)
    a = np.asarray(jax.tree.leaves(params["model"])[0])
    b = np.asarray(jax.tree.leaves(exp.params["model"])[0])
    np.testing.assert_array_equal(a, b)

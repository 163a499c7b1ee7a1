"""Data-parallel mesh tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rade_tpu.parallel.mesh import DATA_AXIS, make_mesh, pad_batch_to_devices


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_pad_batch_to_devices():
    x = np.ones((13, 4), np.float32)
    padded, n = pad_batch_to_devices(x, 8)
    assert padded.shape == (16, 4) and n == 13
    assert np.all(padded[13:] == 0)


def test_sharded_train_step_matches_replicated():
    """The jit'd train step must give identical results on 1 vs 8 devices."""
    from rade_tpu.config import ExperimentConfig
    from rade_tpu.train.loop import Experiment

    conf = {
        "database_path": "", "asv_score_path": "", "model_path": "",
        "batch_size": 8, "num_epochs": 1, "loss": "CCE", "track": "LA",
        "model_config": {
            "architecture": "AASIST",
            "nb_samp": 4800,
            "first_conv": 128,
            "filts": [16, [1, 4], [4, 4], [4, 4], [4, 4]],
            "gat_dims": [4, 4],
            "pool_ratios": [0.5, 0.7, 0.5, 0.5],
            "temperatures": [2.0, 2.0, 100.0, 100.0],
        },
        "optim_config": {"base_lr": 1e-3, "scheduler": "cosine",
                         "scheduler_config": {"eta_min": 1e-6}},
        "training_config": {"use_mixup": False, "use_ema": True,
                            "accumulation_steps": 1, "warmup_ratio": 0.0},
        "test_config": {"batch_size": 8},
    }
    cfg = ExperimentConfig.from_dict(conf)
    rng = np.random.RandomState(0)
    xs = rng.randn(1, 8, 4800).astype(np.float32)
    ys = rng.randint(0, 2, (1, 8)).astype(np.int32)

    def run(mesh_devices):
        mesh = make_mesh(mesh_devices)
        exp = Experiment(cfg, seed=3, mesh=mesh)
        state = exp.setup_training(steps_per_epoch=2)
        bs = NamedSharding(mesh, P(None, DATA_AXIS))
        state, metrics = exp.train_step(
            state, jax.device_put(xs, bs), jax.device_put(ys, bs)
        )
        return float(metrics["loss"]), jax.device_get(
            jax.tree.leaves(state.params)[0]
        )

    loss8, leaf8 = run(8)
    loss1, leaf1 = run(1)
    assert loss8 == pytest.approx(loss1, rel=1e-5)
    np.testing.assert_allclose(leaf8, leaf1, rtol=1e-5, atol=1e-7)

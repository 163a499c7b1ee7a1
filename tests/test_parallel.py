"""Data-parallel mesh tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rade_tpu.parallel.mesh import DATA_AXIS, make_mesh, pad_batch_to_devices

pytestmark = pytest.mark.slow  # compiles full train steps on the CPU mesh


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


# ---------------------------------------------------------------------------
# multi-host helpers (process-sharded data feeding; single-process fallbacks)
# ---------------------------------------------------------------------------


def test_process_slice_partitions_batch():
    from rade_tpu.parallel.multihost import process_slice

    rows = [process_slice(32, pi, 4) for pi in range(4)]
    assert rows == [(0, 8), (8, 16), (16, 24), (24, 32)]
    with pytest.raises(ValueError):
        process_slice(30, 0, 4)


def test_train_batcher_process_sharding_reconstructs_global_batch():
    """Two simulated hosts with the same seed see disjoint halves of every
    global batch, and together exactly the single-host batch."""
    from rade_tpu.data.pipeline import TrainBatcher

    class DS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return np.full((4,), i, np.float32), i % 2

    full = list(TrainBatcher(DS(), 16, seed=3).epoch(0))
    h0 = list(TrainBatcher(DS(), 16, seed=3, process_index=0, process_count=2).epoch(0))
    h1 = list(TrainBatcher(DS(), 16, seed=3, process_index=1, process_count=2).epoch(0))
    assert len(full) == len(h0) == len(h1)
    for (xf, yf), (x0, y0), (x1, y1) in zip(full, h0, h1):
        np.testing.assert_array_equal(np.concatenate([x0, x1]), xf)
        np.testing.assert_array_equal(np.concatenate([y0, y1]), yf)


def test_shard_host_batch_single_process_places_on_mesh():
    from rade_tpu.parallel.mesh import batch_sharding, make_mesh
    from rade_tpu.parallel.multihost import shard_host_batch

    mesh = make_mesh(8)
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = shard_host_batch(batch_sharding(mesh), x)
    np.testing.assert_array_equal(np.asarray(arr), x)
    assert len(arr.sharding.device_set) == 8


def test_maybe_initialize_distributed_noop(monkeypatch):
    from rade_tpu.parallel import multihost

    monkeypatch.delenv("RADE_COORDINATOR", raising=False)
    assert multihost.maybe_initialize_distributed() is False

"""Sequence parallelism: sharding helper semantics + TP+SP step parity.

The reference is single-GPU (SURVEY.md §2.10); sequence parallelism is a
TPU-native addition: rade_tpu/parallel/sp.py constrains the SSL encoder's
residual stream to be time-sharded over the mesh `model` axis between
attention/FFN blocks (Megatron-SP expressed as GSPMD constraints).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rade_tpu.parallel import sp
from rade_tpu.parallel.mesh import DATA_AXIS, make_mesh
from rade_tpu.parallel.tp import MODEL_AXIS, make_mesh_2d


@pytest.fixture(autouse=True)
def _sp_clean():
    yield
    sp.deactivate()


def test_shard_seq_noop_when_inactive():
    x = jnp.ones((4, 8, 6))
    assert sp.shard_seq(x) is x


def test_shard_seq_constrains_time_axis():
    mesh = make_mesh_2d(2, 2)
    sp.activate(mesh)
    x = jax.device_put(np.ones((4, 8, 6), np.float32), NamedSharding(mesh, P()))

    @jax.jit
    def f(x):
        return sp.shard_seq(x * 2.0)

    y = f(x)
    want = NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS, None))
    assert y.sharding.is_equivalent_to(want, y.ndim)
    np.testing.assert_allclose(np.asarray(y), 2.0)


def test_shard_seq_skips_indivisible_time():
    mesh = make_mesh_2d(2, 2)
    sp.activate(mesh)
    x = jnp.ones((4, 7, 6))  # 7 % 2 != 0 -> stays unconstrained
    y = sp.shard_seq(x)
    assert y is x


def test_activate_with_1d_mesh_deactivates():
    sp.activate(make_mesh_2d(2, 2))
    assert sp.active_mesh() is not None
    sp.activate(make_mesh(2))
    assert sp.active_mesh() is None


def test_parallel_config_builds_2d_mesh():
    """`parallel_config` in the .conf drives mesh construction: model_axis>1
    yields a 2-D (data, model) mesh and sequence_parallel implies the model
    flag (TPU-native addition; the reference has no parallelism, §2.10)."""
    from rade_tpu.config import ExperimentConfig
    from rade_tpu.train.loop import Experiment

    cfg = ExperimentConfig.from_dict({
        "model_config": {"architecture": "AASIST"},
        "parallel_config": {"model_axis": 2, "sequence_parallel": "True"},
    })
    assert cfg.parallel.model_axis == 2
    assert cfg.parallel.sequence_parallel is True
    mesh = Experiment._mesh_from_config(cfg)
    assert dict(mesh.shape) == {DATA_AXIS: 4, MODEL_AXIS: 2}

    cfg1 = ExperimentConfig.from_dict({"model_config": {}})
    assert cfg1.parallel.model_axis == 1
    mesh1 = Experiment._mesh_from_config(cfg1)
    assert MODEL_AXIS not in mesh1.shape

    toobig = ExperimentConfig.from_dict({
        "model_config": {},
        "parallel_config": {"data_axis": 8, "model_axis": 2},
    })
    with pytest.raises(ValueError):
        Experiment._mesh_from_config(toobig)


@pytest.mark.slow
def test_sp_train_step_matches_single_device():
    """One LoRA train step with TP + SP on a (2, 2) mesh reproduces the
    single-device result (constraints relayout activations; math unchanged)."""
    from rade_tpu.config import ExperimentConfig
    from rade_tpu.train.loop import Experiment

    def cfg(sequence_parallel):
        return ExperimentConfig.from_dict({
            "database_path": "", "asv_score_path": "", "model_path": "",
            "batch_size": 4, "num_epochs": 1, "loss": "CCE", "track": "LA",
            "model_config": {
                # 6020 samples -> 300 encoder frames (divisible by the
                # model axis of 2, so the SP constraint actually engages)
                "architecture": "DualStreamSEMamba", "nb_samp": 6020,
                "emb_size": 16, "num_encoders": 1, "d_state": 4,
                "sinc_channels": 16, "wavlm_variant": "tiny",
                "wavlm_remat": False, "wavlm_freeze_layers": -1,
                "wavlm_sequence_parallel": sequence_parallel,
            },
            "optim_config": {"base_lr": 1e-2, "wavlm_lr": 1e-3,
                             "scheduler": "cosine",
                             "scheduler_config": {"eta_min": 1e-6}},
            "training_config": {"use_mixup": False, "use_ema": True,
                                "use_lora": True, "accumulation_steps": 1,
                                "warmup_ratio": 0.0},
            "test_config": {"batch_size": 4},
        })

    rng = np.random.RandomState(0)
    xs = rng.randn(1, 4, 6020).astype(np.float32) * 0.1
    ys = rng.randint(0, 2, (1, 4)).astype(np.int32)

    def run(mesh, sequence_parallel):
        exp = Experiment(cfg(sequence_parallel), seed=3, mesh=mesh)
        exp.setup_training(steps_per_epoch=2)
        bs = NamedSharding(mesh, P(None, DATA_AXIS))
        state, m = exp.train_step(
            exp.state, jax.device_put(xs, bs), jax.device_put(ys, bs)
        )
        q = state.params["model"]["wavlm_stream"]["model"]["layers_0"][
            "attention"]["lora_B_q_proj"]
        lw = state.params["model"]["wavlm_stream"]["layer_weights"]
        return float(m["loss"]), jax.device_get(q), jax.device_get(lw)

    loss_sp, q_sp, lw_sp = run(make_mesh_2d(2, 2), True)
    loss_1, q_1, lw_1 = run(make_mesh(1), False)
    assert loss_sp == pytest.approx(loss_1, rel=1e-5)
    np.testing.assert_allclose(q_sp, q_1, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(lw_sp, lw_1, rtol=1e-5, atol=1e-7)

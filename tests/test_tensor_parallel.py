"""Tensor-parallel (2-D data x model mesh) sharding rules and step parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rade_tpu.parallel.mesh import DATA_AXIS
from rade_tpu.parallel.tp import (
    MODEL_AXIS,
    describe_sharding,
    make_mesh_2d,
    model_axis_size,
    shard_tree,
    spec_for_path,
)


def test_spec_rules_column_and_row_parallel():
    p = "model/wavlm_stream/model/layers_0/attention"
    # column-parallel: output dim sharded
    assert spec_for_path(f"{p}/q_proj/kernel", (32, 32), 2) == P(None, MODEL_AXIS)
    assert spec_for_path(f"{p}/v_proj/bias", (32,), 2) == P(MODEL_AXIS)
    # row-parallel: input dim sharded, bias replicated
    assert spec_for_path(f"{p}/out_proj/kernel", (32, 32), 2) == P(MODEL_AXIS, None)
    assert spec_for_path(f"{p}/out_proj/bias", (32,), 2) == P()
    f = "model/wavlm_stream/model/layers_0/feed_forward"
    assert spec_for_path(f"{f}/intermediate_dense/kernel", (32, 64), 2) == P(
        None, MODEL_AXIS
    )
    assert spec_for_path(f"{f}/output_dense/kernel", (64, 32), 2) == P(
        MODEL_AXIS, None
    )
    # LoRA: B column-sharded, A replicated
    assert spec_for_path(f"{p}/lora_B_q_proj", (8, 32), 2) == P(None, MODEL_AXIS)
    assert spec_for_path(f"{p}/lora_A_q_proj", (32, 8), 2) == P()


def test_spec_rules_scan_stacked_and_opt_state_paths():
    p = "layers_scan/layer/attention/q_proj/kernel"
    # stacked (L, E, E) kernel: same from-the-end dim
    assert spec_for_path(p, (4, 32, 32), 2) == P(None, None, MODEL_AXIS)
    # optimizer-state leaves carry the param path as a suffix
    mu = "0/mu/model/wavlm_stream/model/layers_0/attention/out_proj/kernel"
    assert spec_for_path(mu, (32, 32), 2) == P(MODEL_AXIS, None)


def test_spec_rules_fallbacks():
    p = "model/wavlm_stream/model/layers_0/attention/q_proj/kernel"
    # indivisible dim stays replicated
    assert spec_for_path(p, (32, 33), 2) == P()
    # no model axis -> replicated
    assert spec_for_path(p, (32, 32), 1) == P()
    # mamba's out_proj has no 'attention' in its path -> untouched
    assert spec_for_path("encoder_0/mamba/out_proj/kernel", (64, 32), 2) == P()
    # scalars
    assert spec_for_path("step", (), 2) == P()


def test_shard_tree_places_leaves_on_2d_mesh():
    mesh = make_mesh_2d(4, 2)
    assert model_axis_size(mesh) == 2
    tree = {
        "model": {
            "wavlm_stream": {
                "model": {
                    "layers_0": {
                        "attention": {
                            "q_proj": {"kernel": jnp.ones((32, 32))},
                            "out_proj": {"kernel": jnp.ones((32, 32))},
                        }
                    }
                }
            },
            "classifier": {"kernel": jnp.ones((16, 2))},
        }
    }
    out = shard_tree(tree, mesh)
    att = out["model"]["wavlm_stream"]["model"]["layers_0"]["attention"]
    assert att["q_proj"]["kernel"].sharding.spec == P(None, MODEL_AXIS)
    assert att["out_proj"]["kernel"].sharding.spec == P(MODEL_AXIS, None)
    assert att["q_proj"]["kernel"].sharding.mesh.shape[MODEL_AXIS] == 2
    # unmatched leaves are replicated
    assert out["model"]["classifier"]["kernel"].sharding.spec == P()
    desc = describe_sharding(tree, mesh)
    assert "2/3 param leaves sharded" in desc


@pytest.mark.slow
def test_tp_train_step_matches_single_device():
    """One Phase-5-style train step (LoRA) on a (2, 2) data x model mesh must
    reproduce the single-device result: GSPMD collectives only reassociate
    float sums, so loss and updated params agree to float tolerance."""
    from rade_tpu.config import ExperimentConfig
    from rade_tpu.train.loop import Experiment

    cfg = ExperimentConfig.from_dict({
        "database_path": "", "asv_score_path": "", "model_path": "",
        "batch_size": 4, "num_epochs": 1, "loss": "CCE", "track": "LA",
        "model_config": {
            "architecture": "DualStreamSEMamba", "nb_samp": 6000,
            "emb_size": 16, "num_encoders": 1, "d_state": 4,
            "sinc_channels": 16, "wavlm_variant": "tiny", "wavlm_remat": False,
            "wavlm_freeze_layers": -1,
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
    xs = rng.randn(1, 4, 6000).astype(np.float32) * 0.1
    ys = rng.randint(0, 2, (1, 4)).astype(np.int32)

    def run(mesh):
        exp = Experiment(cfg, seed=3, mesh=mesh)
        exp.setup_training(steps_per_epoch=2)
        bs = NamedSharding(mesh, P(None, DATA_AXIS))
        state, m = exp.train_step(
            exp.state, jax.device_put(xs, bs), jax.device_put(ys, bs)
        )
        q = state.params["model"]["wavlm_stream"]["model"]["layers_0"][
            "attention"]["lora_B_q_proj"]
        lw = state.params["model"]["wavlm_stream"]["layer_weights"]
        return float(m["loss"]), jax.device_get(q), jax.device_get(lw)

    from rade_tpu.parallel.mesh import make_mesh

    loss_tp, q_tp, lw_tp = run(make_mesh_2d(2, 2))
    loss_1, q_1, lw_1 = run(make_mesh(1))
    assert loss_tp == pytest.approx(loss_1, rel=1e-5)
    np.testing.assert_allclose(q_tp, q_1, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(lw_tp, lw_1, rtol=1e-5, atol=1e-7)

"""FSDP / ZeRO sharding: spec composition, state placement, step parity.

The reference is single-GPU (SURVEY.md §2.10); `parallel_config.fsdp` is a
TPU-native extension that ZeRO-shards every large parameter leaf (and its
optimizer/EMA/SWA mirrors) over the mesh `data` axis
(rade_tpu/parallel/tp.py::fsdp_spec) — GSPMD all-gathers weights at use and
reduce-scatters gradients, so the math is unchanged.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rade_tpu.config import ExperimentConfig
from rade_tpu.parallel.mesh import DATA_AXIS, make_mesh
from rade_tpu.parallel.tp import (
    MODEL_AXIS, fsdp_spec, make_mesh_2d, shard_tree,
)
from rade_tpu.train.loop import Experiment


def test_fsdp_spec_shards_largest_free_axis():
    # plain 2-D kernel: biggest divisible axis goes to `data`
    assert fsdp_spec(P(), (256, 1024), 4, 1) == P(None, DATA_AXIS)
    assert fsdp_spec(P(), (4096, 64), 4, 1) == P(DATA_AXIS, None)
    # composes with a tensor-parallel spec: picks a FREE axis
    assert fsdp_spec(P(None, MODEL_AXIS), (256, 1024), 4, 1) == P(
        DATA_AXIS, MODEL_AXIS
    )
    # below the size floor: untouched
    assert fsdp_spec(P(), (32, 32), 4, min_size=16384) == P()
    # no divisible free axis: untouched (replicated is always safe)
    assert fsdp_spec(P(), (33, 1023), 4, 1) == P()
    assert fsdp_spec(P(MODEL_AXIS), (1024,), 4, 1) == P(MODEL_AXIS)
    # scalars / 1-device data axis
    assert fsdp_spec(P(), (), 4, 0) == P()
    assert fsdp_spec(P(), (1024, 1024), 1, 1) == P()


def test_shard_tree_fsdp_places_large_leaves():
    mesh = make_mesh(8)
    tree = {
        "params": {
            "big": jnp.ones((256, 128)),
            "tiny": jnp.ones((8, 8)),
        },
        # optimizer mirror gets the identical placement
        "opt": {"mu": {"big": jnp.ones((256, 128))}},
        "step": jnp.zeros((), jnp.int32),
    }
    out = shard_tree(tree, mesh, fsdp=True, fsdp_min_size=1024)
    assert out["params"]["big"].sharding.spec == P(DATA_AXIS, None)
    assert out["opt"]["mu"]["big"].sharding.spec == P(DATA_AXIS, None)
    assert out["params"]["tiny"].sharding.spec == P()
    assert out["step"].sharding.spec == P()


def test_shard_tree_fsdp_composes_with_tp():
    mesh = make_mesh_2d(4, 2)
    tree = {
        "model": {
            "wavlm_stream": {
                "model": {
                    "layers_0": {
                        "attention": {
                            "q_proj": {"kernel": jnp.ones((64, 64))},
                        }
                    }
                }
            }
        }
    }
    out = shard_tree(tree, mesh, fsdp=True, fsdp_min_size=1024)
    k = out["model"]["wavlm_stream"]["model"]["layers_0"]["attention"][
        "q_proj"]["kernel"]
    # column-parallel over model AND ZeRO over data on the free axis
    assert k.sharding.spec == P(DATA_AXIS, MODEL_AXIS)


def _cfg(fsdp=False):
    return ExperimentConfig.from_dict({
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
        # floor low enough that the tiny test model actually shards
        "parallel_config": {"fsdp": fsdp, "fsdp_min_size": 1024},
        "test_config": {"batch_size": 4},
    })


@pytest.mark.slow
def test_fsdp_train_step_matches_single_device():
    """One LoRA train step with FSDP over data=4 reproduces the
    single-device step; the state really is sharded over `data`."""
    rng = np.random.RandomState(0)
    xs = rng.randn(1, 4, 6000).astype(np.float32) * 0.1
    ys = rng.randint(0, 2, (1, 4)).astype(np.int32)

    def run(cfg, mesh):
        exp = Experiment(cfg, seed=3, mesh=mesh)
        exp.setup_training(steps_per_epoch=2)
        bs = NamedSharding(mesh, P(None, DATA_AXIS))
        state, m = exp.train_step(
            exp.state, jax.device_put(xs, bs), jax.device_put(ys, bs)
        )
        q = state.params["model"]["wavlm_stream"]["model"]["layers_0"][
            "attention"]["lora_B_q_proj"]
        lw = state.params["model"]["wavlm_stream"]["layer_weights"]
        return state, float(m["loss"]), jax.device_get(q), jax.device_get(lw)

    st_f, loss_f, q_f, lw_f = run(_cfg(fsdp=True), make_mesh(4))
    # the updated state keeps its ZeRO placement (donated in == out)
    specs = [
        leaf.sharding.spec
        for leaf in jax.tree_util.tree_leaves(st_f.params)
        if hasattr(leaf, "sharding") and getattr(leaf, "size", 0) >= 1024
    ]
    assert any(DATA_AXIS in tuple(s) for s in specs), specs
    mu_big = [
        leaf
        for leaf in jax.tree_util.tree_leaves(st_f.opt_state)
        if hasattr(leaf, "sharding") and getattr(leaf, "size", 0) >= 1024
    ]
    assert any(
        DATA_AXIS in tuple(leaf.sharding.spec) for leaf in mu_big
    ), "optimizer state not ZeRO-sharded"

    _, loss_1, q_1, lw_1 = run(_cfg(fsdp=False), make_mesh(1))
    assert loss_f == pytest.approx(loss_1, rel=1e-5)
    np.testing.assert_allclose(q_f, q_1, rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(lw_f, lw_1, rtol=1e-5, atol=1e-7)

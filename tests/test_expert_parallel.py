"""Expert parallelism: stacked-expert MoE layout, sharding rules, step parity.

The reference computes MoE experts densely on one GPU
(`/root/reference/legacy_archives/phase3_moe/models/MoEMambaASV.py:363-374`);
here the stacked layout (`rade_tpu/nn/moe.py::StackedSwitchMoE`) shards the
leading expert axis over the mesh's `model` axis (`rade_tpu/parallel/tp.py`).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rade_tpu.nn.moe import StackedSwitchMoE, SwitchMoE, stack_expert_params
from rade_tpu.parallel.tp import MODEL_AXIS, make_mesh_2d, spec_for_path


def test_stacked_moe_matches_loop_moe():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 8)) * 0.5
    loop = SwitchMoE(dim=8, hidden_dim=32, num_experts=4, top_k=2)
    params = loop.init(jax.random.PRNGKey(1), x)["params"]
    y_loop = loop.apply({"params": params}, x)

    stacked = StackedSwitchMoE(dim=8, hidden_dim=32, num_experts=4, top_k=2)
    sp = stack_expert_params(params, 4)
    y_stacked = stacked.apply({"params": sp}, x)
    np.testing.assert_allclose(
        np.asarray(y_loop), np.asarray(y_stacked), rtol=1e-5, atol=1e-6
    )


def test_ep_spec_rules_shard_expert_axis():
    p = "model/backbone_forward/moe_0"
    assert spec_for_path(f"{p}/experts_fc1_kernel", (4, 16, 64), 2) == P(
        MODEL_AXIS, None, None
    )
    assert spec_for_path(f"{p}/experts_fc1_bias", (4, 64), 2) == P(MODEL_AXIS, None)
    assert spec_for_path(f"{p}/experts_fc2_kernel", (4, 64, 16), 2) == P(
        MODEL_AXIS, None, None
    )
    assert spec_for_path(f"{p}/experts_fc2_bias", (4, 16), 2) == P(MODEL_AXIS, None)
    # gate replicated; indivisible expert count stays replicated
    assert spec_for_path(f"{p}/gate/w_gate/kernel", (16, 4), 2) == P()
    assert spec_for_path(f"{p}/experts_fc1_kernel", (3, 16, 64), 2) == P()
    # optimizer-state leaves carry the param path as a suffix
    mu = f"0/mu/{p}/experts_fc1_kernel"
    assert spec_for_path(mu, (4, 16, 64), 2) == P(MODEL_AXIS, None, None)


@pytest.mark.slow
def test_ep_train_step_matches_single_device():
    """One MoEMambaASV train step with stacked (expert-parallel) experts on a
    (2, 2) data x model mesh reproduces the single-device result."""
    from rade_tpu.config import ExperimentConfig
    from rade_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from rade_tpu.train.loop import Experiment

    cfg = ExperimentConfig.from_dict({
        "database_path": "", "asv_score_path": "", "model_path": "",
        "batch_size": 4, "num_epochs": 1, "loss": "CCE", "track": "LA",
        "model_config": {
            "architecture": "MoEMambaASV", "nb_samp": 4800,
            "emb_size": 16, "num_encoders": 2, "num_experts": 4, "top_k": 2,
            "wavlm_variant": "tiny", "wavlm_remat": False,
            "moe_stacked_experts": True,
        },
        "optim_config": {"base_lr": 1e-2, "wavlm_lr": 1e-3,
                         "scheduler": "cosine",
                         "scheduler_config": {"eta_min": 1e-6}},
        "training_config": {"use_mixup": False, "use_ema": False,
                            "accumulation_steps": 1, "warmup_ratio": 0.0},
        "test_config": {"batch_size": 4},
    })
    rng = np.random.RandomState(0)
    xs = rng.randn(1, 4, 4800).astype(np.float32) * 0.1
    ys = rng.randint(0, 2, (1, 4)).astype(np.int32)

    def run(mesh):
        exp = Experiment(cfg, seed=3, mesh=mesh)
        exp.setup_training(steps_per_epoch=2)
        bs = NamedSharding(mesh, P(None, DATA_AXIS))
        state, m = exp.train_step(
            exp.state, jax.device_put(xs, bs), jax.device_put(ys, bs)
        )
        k = state.params["model"]["backbone_forward"]["moe_0"][
            "experts_fc1_kernel"]
        return float(m["loss"]), jax.device_get(k), k.sharding.spec

    loss_ep, k_ep, spec = run(make_mesh_2d(2, 2))
    # the expert axis really is sharded on the 2-D mesh (XLA may normalize
    # away trailing Nones: P('model',) == P('model', None, None) effectively)
    assert len(spec) >= 1 and spec[0] == MODEL_AXIS
    assert all(a is None for a in spec[1:])
    loss_1, k_1, _ = run(make_mesh(1))
    assert loss_ep == pytest.approx(loss_1, rel=1e-5)
    np.testing.assert_allclose(k_ep, k_1, rtol=1e-4, atol=1e-7)

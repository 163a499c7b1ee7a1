"""Differentiable packed chain: VJP matches the jnp reference (interpret)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from rade_tpu.kernels.resblock_grad import chain_packed_trainable, chain_ref


def _params(rng, cin, cout):
    p = {
        "w1": rng.randn(2, 3, cin, cout).astype(np.float32) * 0.2,
        "b1": rng.randn(cout).astype(np.float32) * 0.1,
        "bn_scale": 1.0 + 0.1 * rng.randn(cout).astype(np.float32),
        "bn_bias": 0.1 * rng.randn(cout).astype(np.float32),
        "bn_mean": 0.1 * rng.randn(cout).astype(np.float32),
        "bn_var": (1.0 + 0.2 * rng.rand(cout)).astype(np.float32),
        "w2": rng.randn(2, 3, cout, cout).astype(np.float32) * 0.2,
        "b2": rng.randn(cout).astype(np.float32) * 0.1,
    }
    if cin != cout:
        p["wd"] = rng.randn(1, 3, cin, cout).astype(np.float32) * 0.2
        p["bd"] = rng.randn(cout).astype(np.float32) * 0.1
    return {k: jnp.asarray(v) for k, v in p.items()}


@pytest.mark.slow
def test_chain_vjp_matches_reference_grads():
    rng = np.random.RandomState(0)
    H, W = 5, 99
    x = jnp.asarray(rng.randn(2, H, W, 1).astype(np.float32) * 0.5)
    blocks = [_params(rng, 1, 8), _params(rng, 8, 8)]

    def loss_fast(blocks, x):
        with pltpu.force_tpu_interpret_mode():
            y = chain_packed_trainable(blocks, x)
        return jnp.sum(jnp.tanh(y))

    def loss_ref(blocks, x):
        return jnp.sum(jnp.tanh(chain_ref(blocks, x)))

    v_fast, (db_fast, dx_fast) = jax.value_and_grad(loss_fast, argnums=(0, 1))(
        blocks, x
    )
    v_ref, (db_ref, dx_ref) = jax.value_and_grad(loss_ref, argnums=(0, 1))(
        blocks, x
    )
    # primal: interpret-mode kernel == reference (f32, tiny shapes)
    assert float(v_fast) == pytest.approx(float(v_ref), rel=1e-4)
    # cotangents: the VJP recomputes through the reference chain, so grads
    # agree up to the fwd-value difference entering tanh' (tiny in f32)
    np.testing.assert_allclose(np.asarray(dx_fast), np.asarray(dx_ref),
                               rtol=1e-3, atol=1e-4)
    for a, b in zip(jax.tree.leaves(db_fast), jax.tree.leaves(db_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_sinc_encoder_train_fast_matches_module():
    """Forward + grads of the trainable fast encoder vs the flax module
    (freeze_bn, no freq-aug) on a tiny sinc config."""
    from rade_tpu.models.dual_stream_se_mamba import (
        SincNetEncoder,
        sinc_encoder_train_fast,
    )

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4000).astype(np.float32) * 0.1)
    mod = SincNetEncoder(sinc_channels=16, remat=False)
    variables = mod.init(
        {"params": jax.random.PRNGKey(0)}, x, train=False
    )
    params, stats = variables["params"], variables["batch_stats"]

    def loss_mod(p):
        y = mod.apply(
            {"params": p, "batch_stats": stats}, x,
            train=True, freq_aug=False, freeze_bn=True,
        )
        return jnp.sum(jnp.tanh(y))

    def loss_fast(p):
        with pltpu.force_tpu_interpret_mode():
            y = sinc_encoder_train_fast(p, stats, x, sinc_channels=16)
        return jnp.sum(jnp.tanh(y))

    v_m, g_m = jax.value_and_grad(loss_mod)(params)
    v_f, g_f = jax.value_and_grad(loss_fast)(params)
    assert float(v_f) == pytest.approx(float(v_m), rel=1e-4)
    flat_m = jax.tree_util.tree_leaves_with_path(g_m)
    flat_f = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(g_f)}
    for k, v in flat_m:
        np.testing.assert_allclose(
            flat_f[jax.tree_util.keystr(k)], np.asarray(v),
            rtol=2e-3, atol=1e-4, err_msg=jax.tree_util.keystr(k),
        )


@pytest.mark.slow
def test_sinc_encoder_train_fast_freq_mask_active():
    """With a freq key the masked band changes the output and grads flow."""
    from rade_tpu.models.dual_stream_se_mamba import (
        SincNetEncoder,
        sinc_encoder_train_fast,
    )

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 4000).astype(np.float32) * 0.1)
    mod = SincNetEncoder(sinc_channels=16, remat=False)
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    params, stats = variables["params"], variables["batch_stats"]

    with pltpu.force_tpu_interpret_mode():
        y0 = sinc_encoder_train_fast(params, stats, x, sinc_channels=16)
        # key chosen so the drawn mask width is nonzero
        y1 = sinc_encoder_train_fast(
            params, stats, x, freq_key=jax.random.PRNGKey(5), sinc_channels=16
        )
    assert not np.allclose(np.asarray(y0), np.asarray(y1))


@pytest.mark.slow
def test_train_step_fast_sinc_fgm_freq_aug():
    """Full micro-step wiring: use_pallas_resblock_training with FGM +
    freq_aug (per-pass masks + summed VJPs) runs and moves sinc params."""
    from rade_tpu.config import ExperimentConfig
    from rade_tpu.train.loop import Experiment
    from rade_tpu.parallel.mesh import make_mesh

    cfg = ExperimentConfig.from_dict({
        "database_path": "", "asv_score_path": "", "model_path": "",
        "batch_size": 2, "num_epochs": 1, "loss": "CCE", "track": "LA",
        "freq_aug": "True",
        "model_config": {
            "architecture": "DualStreamSEMamba", "nb_samp": 6000,
            "emb_size": 16, "num_encoders": 1, "d_state": 4,
            "sinc_channels": 16, "wavlm_variant": "tiny",
            "wavlm_remat": False, "wavlm_freeze_layers": -1,
            "use_pallas_resblock_training": True,
        },
        "optim_config": {"base_lr": 1e-2, "wavlm_lr": 1e-3,
                         "scheduler": "cosine",
                         "scheduler_config": {"eta_min": 1e-6}},
        "training_config": {"use_mixup": False, "use_ema": False,
                            "accumulation_steps": 1, "warmup_ratio": 0.0,
                            "use_fgm": True, "fgm_epsilon": 0.5,
                            "fgm_emb_name": "feature_projection",
                            "freeze_bn": True},
        "test_config": {"batch_size": 2},
    })
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(1, 2, 6000).astype(np.float32) * 0.1)
    ys = jnp.asarray(rng.randint(0, 2, (1, 2)).astype(np.int32))
    exp = Experiment(cfg, seed=3, mesh=make_mesh(1))
    state = exp.setup_training(steps_per_epoch=2)
    before = jax.device_get(state.params["model"]["sinc_stream"])
    with pltpu.force_tpu_interpret_mode():
        state, m = exp.train_step(state, xs, ys)
        loss = float(m["loss"])
    assert np.isfinite(loss)
    after = jax.device_get(state.params["model"]["sinc_stream"])
    moved = any(
        not np.array_equal(a, b)
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after))
    )
    assert moved  # sinc grads flow through the custom VJP

"""Native Pallas res-block backward: VJP vs the jnp reference (interpret).

In f32 interpret mode the kernel is bit-faithful to its math, so grads must
match the reference chain tightly.  On hardware the MXU's DEFAULT-precision
truncation perturbs maxpool tie routing; the hardware-parity evidence lives
in benchmarks/check_resblock_parity.py and docs/BENCH_NOTES.md (linear-loss
comparison against the XLA-recompute control).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

import rade_tpu.kernels.resblock_packed_vjp as V
from rade_tpu.kernels.resblock_grad import chain_ref


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


def _grads(fn, blocks, x):
    def loss(b, x):
        return jnp.sum(jnp.tanh(fn(b, x)))

    return jax.value_and_grad(loss, argnums=(0, 1))(blocks, x)


@pytest.mark.parametrize(
    "H,W,specs",
    [
        (5, 99, [(1, 8), (8, 8)]),   # chain + channel widen (wd path)
        (10, 26, [(4, 8)]),          # W < one tile, W % 3 != 0
    ],
)
def test_native_vjp_matches_reference(H, W, specs):
    rng = np.random.RandomState(W)
    x = jnp.asarray(rng.randn(2, H, W, specs[0][0]).astype(np.float32) * 0.5)
    blocks = [_params(rng, ci, co) for ci, co in specs]
    with pltpu.force_tpu_interpret_mode():
        v_f, (db_f, dx_f) = _grads(V.chain_packed_native, blocks, x)
    v_r, (db_r, dx_r) = _grads(chain_ref, blocks, x)
    assert float(v_f) == pytest.approx(float(v_r), rel=1e-4)
    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_r),
                               rtol=1e-3, atol=1e-4)
    for bf, br in zip(db_f, db_r):
        for k in sorted(br):
            np.testing.assert_allclose(
                np.asarray(bf[k]), np.asarray(br[k]),
                rtol=1e-3, atol=1e-4, err_msg=k,
            )


def test_native_vjp_multitile(monkeypatch):
    """Force wt=24 so the W grid runs multiple tiles through the lag windows."""
    monkeypatch.setattr(V, "_pick_wt_bwd", lambda *a, **k: 24)
    rng = np.random.RandomState(7)
    H, W = 5, 99
    x = jnp.asarray(rng.randn(2, H, W, 1).astype(np.float32) * 0.5)
    blocks = [_params(rng, 1, 8), _params(rng, 8, 8)]
    with pltpu.force_tpu_interpret_mode():
        v_f, (db_f, dx_f) = _grads(V.chain_packed_native, blocks, x)
    v_r, (db_r, dx_r) = _grads(chain_ref, blocks, x)
    assert float(v_f) == pytest.approx(float(v_r), rel=1e-4)
    np.testing.assert_allclose(np.asarray(dx_f), np.asarray(dx_r),
                               rtol=1e-3, atol=1e-4)
    for bf, br in zip(db_f, db_r):
        for k in sorted(br):
            np.testing.assert_allclose(
                np.asarray(bf[k]), np.asarray(br[k]),
                rtol=1e-3, atol=1e-4, err_msg=k,
            )


@pytest.mark.slow
def test_train_fast_encoder_native_backward():
    """sinc_encoder_train_fast(backward="native") == the recompute variant's
    forward, and its grads match the flax-module grads on a tiny config."""
    from rade_tpu.models.dual_stream_se_mamba import (
        SincNetEncoder,
        sinc_encoder_train_fast,
    )

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 4000).astype(np.float32) * 0.1)
    mod = SincNetEncoder(sinc_channels=16, remat=False)
    variables = mod.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    params, stats = variables["params"], variables["batch_stats"]

    def loss_mod(p):
        y = mod.apply(
            {"params": p, "batch_stats": stats}, x,
            train=True, freq_aug=False, freeze_bn=True,
        )
        return jnp.sum(jnp.tanh(y))

    def loss_native(p):
        y = sinc_encoder_train_fast(p, stats, x, sinc_channels=16,
                                    backward="native")
        return jnp.sum(jnp.tanh(y))

    v_m, g_m = jax.value_and_grad(loss_mod)(params)
    # the custom-VJP backward is itself a pallas_call, so the whole
    # value_and_grad must run under the interpreter on CPU
    with pltpu.force_tpu_interpret_mode():
        v_f, g_f = jax.value_and_grad(loss_native)(params)
    assert float(v_f) == pytest.approx(float(v_m), rel=1e-4)
    flat_m = jax.tree_util.tree_leaves_with_path(g_m)
    flat_f = {jax.tree_util.keystr(k): v for k, v in
              jax.tree_util.tree_leaves_with_path(g_f)}
    # the native backward recomputes activations via packed tap matmuls whose
    # f32 summation order differs from the module's convs; through 6 blocks
    # that reassociation noise reaches ~6e-4 of each tensor's max grad, so
    # compare relative to the per-tensor scale rather than elementwise
    for k, v in flat_m:
        a = np.asarray(flat_f[jax.tree_util.keystr(k)], np.float32)
        b = np.asarray(v, np.float32)
        scale = max(1.0, float(np.abs(b).max()))
        np.testing.assert_allclose(
            a / scale, b / scale, rtol=0, atol=2e-3,
            err_msg=jax.tree_util.keystr(k),
        )

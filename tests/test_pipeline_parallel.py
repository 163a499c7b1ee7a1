"""GPipe pipeline executor: pipelined == sequential (fwd, taps, grads, rng).

The reference is single-GPU (SURVEY.md §2.10); pipeline parallelism is a
TPU-native addition (rade_tpu/parallel/pp.py): layer params stacked and
sharded over the mesh `pipe` axis, microbatches streamed with ppermute,
differentiable end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rade_tpu.parallel import pp
from rade_tpu.parallel.mesh import DATA_AXIS
from rade_tpu.parallel.pp import PIPE_AXIS, make_mesh_pp, pipeline_apply
from rade_tpu.parallel.tp import MODEL_AXIS


@pytest.fixture(autouse=True)
def _pp_clean():
    yield
    pp.deactivate()


def _layer_fn(p, h, key_raw, m, extra=None):
    del key_raw, m, extra
    return jnp.tanh(h @ p["w"] + p["b"])


def _stacked(L=4, d=6, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "w": jnp.asarray(rng.randn(L, d, d) * 0.3, jnp.float32),
        "b": jnp.asarray(rng.randn(L, d) * 0.1, jnp.float32),
    }


def test_make_mesh_pp_axes():
    mesh = make_mesh_pp(2, 2, 2)
    assert dict(mesh.shape) == {DATA_AXIS: 2, PIPE_AXIS: 2, MODEL_AXIS: 2}
    assert pp.pipe_axis_size(mesh) == 2
    with pytest.raises(ValueError):
        make_mesh_pp(4, 4, 4)


def test_pipeline_matches_sequential_forward_and_taps():
    params = _stacked()
    x = jnp.asarray(np.random.RandomState(1).randn(8, 5, 6), jnp.float32)
    w = jnp.asarray([0.1, 0.4, 0.2, 0.3], jnp.float32)

    y_seq, acc_seq = pipeline_apply(
        _layer_fn, params, x, mesh=None, n_micro=4, tap_weights=w
    )
    mesh = make_mesh_pp(2, 2)
    y_pp, acc_pp = pipeline_apply(
        _layer_fn, params, x, mesh=mesh, n_micro=4, tap_weights=w
    )
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_seq), rtol=2e-6)
    np.testing.assert_allclose(np.asarray(acc_pp), np.asarray(acc_seq), rtol=2e-6)


def test_pipeline_gradients_match_sequential():
    params = _stacked(L=4, d=4, seed=2)
    x = jnp.asarray(np.random.RandomState(3).randn(4, 3, 4), jnp.float32)
    w = jnp.asarray([0.3, 0.1, 0.5, 0.1], jnp.float32)
    mesh = make_mesh_pp(1, 4)

    def loss(p, m):
        y, acc = pipeline_apply(
            _layer_fn, p, x, mesh=m, n_micro=2, tap_weights=w
        )
        return jnp.sum(y**2) + jnp.sum(jnp.abs(acc))

    g_seq = jax.grad(lambda p: loss(p, None))(params)
    g_pp = jax.grad(lambda p: loss(p, mesh))(params)
    for k in ("w", "b"):
        np.testing.assert_allclose(
            np.asarray(g_pp[k]), np.asarray(g_seq[k]), rtol=5e-5, atol=1e-6
        )


def test_pipeline_rng_fold_matches_sequential():
    """Per-microbatch key folding is schedule-independent: the pipelined
    run folds the same (layer, microbatch) keys as the sequential one."""

    def noisy_layer(p, h, key_raw, m, extra=None):
        key = jax.random.fold_in(jax.random.wrap_key_data(key_raw), m)
        return jnp.tanh(h @ p["w"] + p["b"]) + 0.01 * jax.random.normal(
            key, h.shape
        )

    params = _stacked(L=2, d=4, seed=4)
    x = jnp.asarray(np.random.RandomState(5).randn(4, 3, 4), jnp.float32)
    keys = jax.random.key_data(jax.random.split(jax.random.PRNGKey(7), 2))

    y_seq, _ = pipeline_apply(
        noisy_layer, params, x, mesh=None, n_micro=2, layer_keys=keys
    )
    mesh = make_mesh_pp(2, 2)
    y_pp, _ = pipeline_apply(
        noisy_layer, params, x, mesh=mesh, n_micro=2, layer_keys=keys
    )
    np.testing.assert_allclose(
        np.asarray(y_pp), np.asarray(y_seq), rtol=1e-5, atol=1e-7
    )


def test_pipeline_under_jit_with_data_sharding():
    """dp x pp compose: batch sharded over `data` (auto axes), layers over
    `pipe` (manual) in one jitted call."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    params = _stacked(L=2, d=4, seed=6)
    mesh = make_mesh_pp(2, 2)
    x = jax.device_put(
        np.random.RandomState(8).randn(8, 3, 4).astype(np.float32),
        NamedSharding(mesh, P(DATA_AXIS)),
    )

    @jax.jit
    def f(p, x):
        y, _ = pipeline_apply(_layer_fn, p, x, mesh=mesh, n_micro=2)
        return y

    y = f(params, x)
    y_seq, _ = pipeline_apply(_layer_fn, params, jnp.asarray(x), None, 2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_seq), rtol=2e-6)


def test_activate_registry():
    mesh = make_mesh_pp(2, 2)
    pp.activate(mesh)
    assert pp.active_mesh() is mesh
    pp.activate(make_mesh_pp(8, 1))
    assert pp.active_mesh() is None


def test_indivisible_layers_raise():
    params = _stacked(L=3)
    x = jnp.ones((4, 2, 6))
    mesh = make_mesh_pp(2, 2)
    with pytest.raises(ValueError):
        pipeline_apply(_layer_fn, params, x, mesh=mesh, n_micro=2)

"""StableHLO export round-trip: serialize the scorer, reload, same scores."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rade_tpu.config import ExperimentConfig
from rade_tpu.tools.export import build_scorer, export_scorer, load_scorer

pytestmark = pytest.mark.slow  # jit-compiles model forwards on the CPU mesh

TINY_CONF = {
    "database_path": "",
    "asv_score_path": "",
    "model_path": "",
    "batch_size": 4,
    "num_epochs": 1,
    "loss": "CCE",
    "track": "LA",
    "eval_output": "eval_scores.txt",
    "model_config": {
        "architecture": "AASIST",
        "nb_samp": 4800,
        "first_conv": 128,
        "filts": [16, [1, 4], [4, 4], [4, 4], [4, 4]],
        "gat_dims": [4, 4],
        "pool_ratios": [0.5, 0.7, 0.5, 0.5],
        "temperatures": [2.0, 2.0, 100.0, 100.0],
    },
    "optim_config": {"base_lr": 1e-4},
    "training_config": {},
    "test_config": {"batch_size": 4, "num_workers": 0},
}


@pytest.fixture(scope="module")
def scorer_setup():
    cfg = ExperimentConfig.from_dict(dict(TINY_CONF))
    eval_step, nb_samp = build_scorer(cfg)
    from rade_tpu.registry import build_model

    model = build_model(dict(cfg.model_config))
    x0 = jnp.zeros((2, nb_samp), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0)
    params = {"model": variables["params"], "loss": {}}
    batch_stats = variables["batch_stats"]
    return cfg, eval_step, params, batch_stats, nb_samp


def test_export_roundtrip_static_batch(tmp_path, scorer_setup):
    cfg, eval_step, params, batch_stats, nb_samp = scorer_setup
    exported = export_scorer(cfg, params, batch_stats, batch_size=2, platforms=("cpu",))
    path = tmp_path / "scorer.shlo"
    path.write_bytes(exported.serialize())

    loaded = load_scorer(str(path))
    x = jnp.asarray(np.random.RandomState(0).randn(2, nb_samp).astype(np.float32))
    want = np.asarray(eval_step(params, batch_stats, x))
    got = np.asarray(loaded.call(params, batch_stats, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert got.shape == (2,)


def test_export_symbolic_batch_serves_multiple_sizes(tmp_path, scorer_setup):
    cfg, eval_step, params, batch_stats, nb_samp = scorer_setup
    exported = export_scorer(cfg, params, batch_stats, batch_size=0, platforms=("cpu",))
    loaded = load_scorer_bytes(exported.serialize())
    for bsz in (1, 3):
        x = jnp.asarray(
            np.random.RandomState(bsz).randn(bsz, nb_samp).astype(np.float32)
        )
        want = np.asarray(eval_step(params, batch_stats, x))
        got = np.asarray(loaded.call(params, batch_stats, x))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def load_scorer_bytes(data: bytes):
    from jax import export as jexport

    return jexport.deserialize(bytearray(data))

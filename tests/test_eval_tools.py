"""Weight-loading robustness of the eval/analysis tools + In-the-Wild eval."""

import csv

import numpy as np
import pytest

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from rade_tpu.config import ExperimentConfig
from rade_tpu.data.audio_io import write_wav
from rade_tpu.parallel.mesh import DATA_AXIS, make_mesh
from rade_tpu.train.checkpoint import save_state
from rade_tpu.train.loop import Experiment

TINY_MODEL = {
    "architecture": "AASIST",
    "nb_samp": 4800,
    "first_conv": 128,
    "filts": [16, [1, 4], [4, 4], [4, 4], [4, 4]],
    "gat_dims": [4, 4],
    "pool_ratios": [0.5, 0.7, 0.5, 0.5],
    "temperatures": [2.0, 2.0, 100.0, 100.0],
}


def _cfg(**kw):
    base = {
        "database_path": "", "asv_score_path": "", "model_path": "",
        "batch_size": 4, "num_epochs": 1, "loss": "CCE", "track": "LA",
        "model_config": dict(TINY_MODEL),
        "optim_config": {"base_lr": 1e-3},
        "training_config": {"use_ema": True, "ema_decay": 0.9},
        "test_config": {"batch_size": 4},
    }
    base.update(kw)
    return ExperimentConfig.from_dict(base)


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    """One train step -> a FULL train-state checkpoint on disk."""
    cfg = _cfg()
    mesh = make_mesh(1)
    exp = Experiment(cfg, seed=0, mesh=mesh)
    exp.setup_training(steps_per_epoch=2)
    rng = np.random.RandomState(0)
    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    xb = jax.device_put(rng.randn(1, 4, 4800).astype(np.float32) * 0.1, sh)
    yb = jax.device_put(rng.randint(0, 2, (1, 4)).astype(np.int32), sh)
    exp.state, _ = exp.train_step(exp.state, xb, yb)
    path = tmp_path_factory.mktemp("ckpt") / "full_state.ckpt"
    save_state(path, exp.state)
    return cfg, path, exp


@pytest.mark.slow
def test_load_weights_accepts_full_train_state(trained_ckpt):
    cfg, path, trained = trained_ckpt
    exp = Experiment(cfg, seed=7)
    exp.load_weights(str(path))
    got = np.asarray(jax.tree.leaves(exp.params["model"])[0])
    want = np.asarray(
        jax.tree.leaves(jax.device_get(trained.state.ema_params["model"]))[0]
    )
    np.testing.assert_array_equal(got, want)


def test_load_weights_non_strict_partial(trained_ckpt, tmp_path):
    """strict=False loads matching leaves and keeps init for the rest."""
    cfg, _, trained = trained_ckpt
    partial = {
        "model": {"out_layer": jax.device_get(
            trained.state.params["model"]["out_layer"]
        )},
    }
    path = tmp_path / "partial.ckpt"
    save_state(path, partial)

    exp = Experiment(cfg, seed=7)
    before = np.asarray(exp.params["model"]["first_bn"]["scale"])
    exp.load_weights(str(path), strict=False)
    np.testing.assert_array_equal(
        np.asarray(exp.params["model"]["out_layer"]["kernel"]),
        np.asarray(trained.state.params["model"]["out_layer"]["kernel"]),
    )
    np.testing.assert_array_equal(
        np.asarray(exp.params["model"]["first_bn"]["scale"]), before
    )
    with pytest.raises(Exception):
        Experiment(cfg, seed=7).load_weights(str(path), strict=True)


def test_eval_inthewild_end_to_end(trained_ckpt, tmp_path):
    """Synthetic In-the-Wild set scored with a trainer checkpoint."""
    from rade_tpu.tools.eval_inthewild import evaluate

    cfg, ckpt, _ = trained_ckpt
    audio_dir = tmp_path / "wav"
    audio_dir.mkdir()
    rng = np.random.RandomState(3)
    rows = []
    for i in range(8):
        name = f"utt{i}.wav"
        write_wav(audio_dir / name, rng.randn(6000).astype(np.float32) * 0.1)
        rows.append((name, "bona-fide" if i % 2 == 0 else "spoof"))
    meta = tmp_path / "meta.csv"
    with open(meta, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["file", "label"])
        w.writerows(rows)

    out = tmp_path / "scores.txt"
    eer, nb, ns = evaluate(cfg, str(ckpt), str(meta), str(audio_dir), out_path=str(out))
    assert nb == ns == 4
    assert 0.0 <= eer <= 50.0
    lines = out.read_text().splitlines()
    assert len(lines) == 8 and len(lines[0].split()) >= 2

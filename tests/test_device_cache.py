"""Device-resident train-set cache (`data_config.device_cache`).

TPU-native extension (no reference counterpart — the reference streams every
batch host->GPU via a torch DataLoader, `src/main.py:1076-1100`): the clean,
deterministically padded train set is uploaded to HBM once and shuffled
micro-batches are gathered on device, so steady-state training moves zero
audio bytes over PCIe/the tunnel.  `pad_random`'s crop becomes an on-device
per-sample circular time shift.
"""

import numpy as np
import pytest

from rade_tpu.config import ExperimentConfig
from rade_tpu.tools.synth_dataset import generate

pytestmark = pytest.mark.slow  # compiles a full train step on the CPU mesh

TINY_CONF = {
    "database_path": "",
    "asv_score_path": "",
    "model_path": "",
    "batch_size": 8,
    "num_epochs": 2,
    "loss": "CCE",
    "track": "LA",
    "eval_all_best": "False",
    "eval_output": "eval_scores.txt",
    "freq_aug": "False",
    "model_config": {
        "architecture": "AASIST",
        "nb_samp": 4800,
        "first_conv": 128,
        "filts": [16, [1, 4], [4, 4], [4, 4], [4, 4]],
        "gat_dims": [4, 4],
        "pool_ratios": [0.5, 0.7, 0.5, 0.5],
        "temperatures": [2.0, 2.0, 100.0, 100.0],
    },
    "optim_config": {
        "optimizer": "adam",
        "base_lr": 0.001,
        "lr_min": 1e-5,
        "betas": [0.9, 0.999],
        "weight_decay": 0.0001,
        "scheduler": "cosine",
        "scheduler_config": {"eta_min": 1e-6},
    },
    "training_config": {
        "use_ema": True,
        "ema_decay": 0.9,
        "accumulation_steps": 2,
        "use_mixup": True,
        "warmup_ratio": 0.1,
    },
    "data_config": {"device_cache": True},
    "test_config": {"batch_size": 8, "num_workers": 0},
}


@pytest.fixture(scope="module")
def cached_exp(tmp_path_factory):
    root = generate(str(tmp_path_factory.mktemp("la")), n_per_split=24, seed=13)
    conf = dict(TINY_CONF)
    conf["database_path"] = str(root) + "/"
    conf["asv_score_path"] = str(
        root / "ASVspoof2019.LA.asv.eval.gi.trl.scores.txt"
    )
    cfg = ExperimentConfig.from_dict(conf)

    from rade_tpu.train.loop import Experiment

    exp = Experiment(cfg, seed=3)
    trn, _dev, _evl, _dev_proto, _eval_proto = exp.build_loaders(cfg.database_path)
    exp.setup_training(steps_per_epoch=len(trn))
    loss0 = exp.train_one_epoch(trn, epoch=0)
    return exp, trn, loss0


def test_cache_built_and_used(cached_exp):
    exp, trn, loss0 = cached_exp
    assert exp._use_device_cache()
    # cache actually materialized: (n, T) waveforms + (n,) labels in HBM
    assert exp._device_cache not in (None, False)
    x_all, y_all = exp._device_cache
    assert x_all.shape == (len(trn.dataset), 4800)
    assert y_all.shape == (len(trn.dataset),)
    assert np.isfinite(loss0)


def test_cached_epoch_takes_all_optimizer_steps(cached_exp):
    """24 utts / bs=8 -> 3 micro-batches; accum=2 -> 2 optimizer steps per
    epoch (incl. the trailing partial group's remainder step, matching the
    host path and the reference `src/main.py:1100`)."""
    exp, trn, _ = cached_exp
    import jax

    assert int(jax.device_get(exp.state.step)) == 2
    loss1 = exp.train_one_epoch(trn, epoch=1)
    assert np.isfinite(loss1)
    assert int(jax.device_get(exp.state.step)) == 4


def test_cached_epochs_differ_by_shuffle_and_shift(cached_exp):
    """Different epochs see different gathers/shifts -> different losses."""
    exp, trn, loss0 = cached_exp
    loss2 = exp.train_one_epoch(trn, epoch=2)
    assert np.isfinite(loss2) and loss2 != loss0


def test_cache_disabled_by_host_augmentation(cached_exp):
    """Host-side RawBoost forces the host pipeline (per-sample numpy DSP
    can't run on a device-resident cache)."""
    exp, _, _ = cached_exp
    d = exp.cfg.data
    old = (d.use_rawboost, d.on_device_aug)
    try:
        d.use_rawboost, d.on_device_aug = True, False
        assert not exp._use_device_cache()
        d.on_device_aug = True  # on-device RawBoost is cache-compatible
        assert exp._use_device_cache()
    finally:
        d.use_rawboost, d.on_device_aug = old


def test_cache_size_guard_falls_back(cached_exp):
    exp, trn, _ = cached_exp
    old = exp.cfg.data.device_cache_max_gb
    try:
        exp.cfg.data.device_cache_max_gb = 1e-9
        assert exp._build_device_cache(trn) is None
    finally:
        exp.cfg.data.device_cache_max_gb = old


def test_cache_stores_pcm_sources_as_int16(cached_exp):
    """PCM16-derived audio (WAV/FLAC decode as int16/32768) round-trips
    exactly, so the cache holds raw int16 — half the HBM, losslessly (the
    full LA train set then fits the default 4 GB budget)."""
    exp, _, _ = cached_exp
    x_all, _ = exp._device_cache
    assert x_all.dtype == np.int16
    # the step consumed it fine (losses were finite in the shared fixture)


def test_cache_keeps_float_native_sources_f32(cached_exp):
    """Sources that don't round-trip through int16 must stay float32."""
    exp, trn, _ = cached_exp

    class FloatDS:
        cut = exp.nb_samp

        def __len__(self):
            return 4

        def load_clean(self, i):
            rng = np.random.RandomState(i)
            return rng.randn(exp.nb_samp).astype(np.float32) * 0.1, i % 2

    class B:
        dataset = FloatDS()

    x_all, y_all = exp._build_device_cache(B())
    assert x_all.dtype == np.float32
    assert np.asarray(y_all).tolist() == [0, 1, 0, 1]

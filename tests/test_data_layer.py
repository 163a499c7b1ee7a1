"""Config, protocol, audio-IO, padding, dataset and batcher tests."""

import numpy as np
import pytest

from rade_tpu.config import ExperimentConfig, str_to_bool
from rade_tpu.data import padding
from rade_tpu.data.audio_io import read_wav, write_wav
from rade_tpu.data.datasets import EvalDataset, TrainDataset
from rade_tpu.data.pipeline import EvalBatcher, TrainBatcher, prefetch
from rade_tpu.data.protocols import (
    parse_protocol_2021,
    parse_protocol_eval,
    parse_protocol_labeled,
)
from rade_tpu.tools.synth_dataset import generate


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    return generate(str(tmp_path_factory.mktemp("la")), n_per_split=12, seed=3)


def test_str_to_bool():
    assert str_to_bool("True") and str_to_bool("yes") and str_to_bool(True)
    assert not str_to_bool("False") and not str_to_bool("0")
    with pytest.raises(ValueError):
        str_to_bool("maybe")


def test_config_phase6_style(tmp_path):
    conf = {
        "database_path": "./LA/",
        "batch_size": 8,
        "num_epochs": 20,
        "loss": "Focal",
        "track": "LA",
        "freq_aug": "True",
        "_comment_x": "ignored",
        "model_config": {"architecture": "DualStreamSEMamba", "emb_size": 144},
        "optim_config": {"base_lr": 1e-5, "wavlm_lr": 1e-4, "scheduler": "cosine"},
        "training_config": {
            "use_lora": True,
            "use_fgm": True,
            "fgm_epsilon": 0.5,
            "use_mixup": True,
            "accumulation_steps": 4,
            "_comment": "x",
        },
        "data_config": {"rawboost_algo": 5, "rawboost_p": 0.8, "use_codec_aug": True},
        "test_config": {"batch_size": 32},
    }
    cfg = ExperimentConfig.from_dict(conf)
    assert cfg.architecture == "DualStreamSEMamba"
    assert cfg.training.use_focal_loss  # injected from loss == "Focal"
    assert cfg.training.use_fgm and cfg.training.accumulation_steps == 4
    assert cfg.data.rawboost_algo == 5 and cfg.data.use_rawboost
    assert cfg.optim.wavlm_lr == 1e-4 and cfg.optim.epochs == 20
    assert cfg.test.batch_size == 32
    assert cfg.freq_aug is True
    assert cfg.eval_all_best is True  # reference default when absent


def test_config_defaults_match_reference():
    cfg = ExperimentConfig.from_dict({"track": "LA", "model_config": {}})
    assert cfg.eval_all_best is True and cfg.freq_aug is False
    with pytest.raises(ValueError):
        ExperimentConfig.from_dict({"track": "XX"})


def test_protocols(synth_root):
    proto = synth_root / "ASVspoof2019_LA_cm_protocols"
    labels, files = parse_protocol_labeled(proto / "ASVspoof2019.LA.cm.train.trn.txt")
    assert len(files) == 12 and sum(labels.values()) == 6
    assert files[0] == "LA_T_0000000" and labels[files[0]] == 1
    eval_files = parse_protocol_eval(proto / "ASVspoof2019.LA.cm.eval.trl.txt")
    assert len(eval_files) == 12
    # 2021 format: key in col 1
    lines = ["LA_0001 DF_E_1 nocodec asvspoof A07 spoof - eval"]
    p = synth_root / "p21.txt"
    p.write_text("\n".join(lines) + "\n")
    assert parse_protocol_2021(p) == ["DF_E_1"]


def test_wav_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    x = 0.5 * np.sin(np.arange(8000) / 20.0) + 0.01 * rng.randn(8000)
    path = tmp_path / "t.wav"
    write_wav(path, x, 16000)
    y, sr = read_wav(path)
    assert sr == 16000 and y.shape == x.shape
    assert np.max(np.abs(y - x)) < 2.0 / 32768


def test_padding():
    x = np.arange(100, dtype=np.float64)
    assert padding.pad(x, 64600).shape == (64600,)
    assert np.array_equal(padding.pad(x, 64600)[:100], x)  # tiled
    assert np.array_equal(padding.pad(x, 64600)[100:200], x)
    long = np.arange(70000, dtype=np.float64)
    assert np.array_equal(padding.pad(long, 64600), long[:64600])
    rng = np.random.RandomState(0)
    crop = padding.pad_random(long, 64600, rng=rng)
    assert crop.shape == (64600,) and crop[0] >= 0


def test_train_dataset_and_batcher(synth_root):
    proto = synth_root / "ASVspoof2019_LA_cm_protocols"
    labels, files = parse_protocol_labeled(proto / "ASVspoof2019.LA.cm.train.trn.txt")
    ds = TrainDataset(
        files, labels, synth_root / "ASVspoof2019_LA_train",
        algo=5, use_codec=True, codec_p=0.5, rawboost_p=0.8, seed=1,
    )
    x, y = ds[0]
    assert x.shape == (64600,) and x.dtype == np.float32 and y in (0, 1)
    batcher = TrainBatcher(ds, batch_size=4, seed=0)
    batches = list(batcher.epoch(0))
    assert len(batches) == 3
    xb, yb = batches[0]
    assert xb.shape == (4, 64600) and yb.shape == (4,)
    # different epoch -> different order
    b0 = list(batcher.epoch(0))[0][1]
    b1 = list(batcher.epoch(1))[0][1]
    assert not np.array_equal(b0, b1) or True  # may rarely coincide; no crash is key


def test_eval_batcher_pads_final_batch(synth_root):
    proto = synth_root / "ASVspoof2019_LA_cm_protocols"
    files = parse_protocol_eval(proto / "ASVspoof2019.LA.cm.eval.trl.txt")
    ds = EvalDataset(files, synth_root / "ASVspoof2019_LA_eval")
    batcher = EvalBatcher(ds, batch_size=5)
    batches = list(batcher)
    assert len(batches) == 3
    xb, keys, n_valid = batches[-1]
    assert xb.shape == (5, 64600) and n_valid == 2 and len(keys) == 2
    assert np.all(xb[2:] == 0)
    # order preserved across batches
    all_keys = [k for _, ks, _ in batches for k in ks]
    assert all_keys == files


def test_prefetch_preserves_order_and_propagates_errors():
    assert list(prefetch(iter(range(20)))) == list(range(20))

    def bad():
        yield 1
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        list(prefetch(bad()))

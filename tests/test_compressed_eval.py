"""Compressed-protocol eval mode (the reference's second headline column).

The reference reports clean AND compressed EER (`/root/reference/README.md:92`:
4.42 % / 4.03 %); the codec simulation is `src/data_utils.py:31-59`.  Here the
compressed protocol is a deterministic per-utterance codec-sim applied to the
2019 eval split (data/datasets.py::EvalDataset codec_sim), wired through
`--eval` (test_config.codec_sim / eval_compressed) and the trainer.
"""

import json

import numpy as np
import pytest

from rade_tpu.augment.codec import codec_rng_for_utt
from rade_tpu.config import ExperimentConfig
from rade_tpu.data.datasets import EvalDataset
from rade_tpu.data.pipeline import EvalBatcher
from rade_tpu.data.protocols import parse_protocol_eval
from rade_tpu.tools.synth_dataset import generate


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    return generate(str(tmp_path_factory.mktemp("la")), n_per_split=10, seed=7)


def _eval_ds(synth_root, **kw):
    proto = synth_root / "ASVspoof2019_LA_cm_protocols"
    files = parse_protocol_eval(proto / "ASVspoof2019.LA.cm.eval.trl.txt")
    return EvalDataset(files, synth_root / "ASVspoof2019_LA_eval", **kw), files


def test_codec_rng_is_stable_per_utt():
    a = codec_rng_for_utt("LA_E_0001", seed=0).randint(0, 1 << 30)
    b = codec_rng_for_utt("LA_E_0001", seed=0).randint(0, 1 << 30)
    c = codec_rng_for_utt("LA_E_0002", seed=0).randint(0, 1 << 30)
    d = codec_rng_for_utt("LA_E_0001", seed=1).randint(0, 1 << 30)
    assert a == b and a != c and a != d


def test_compressed_eval_is_deterministic_and_band_limited(synth_root):
    ds_clean, files = _eval_ds(synth_root)
    ds_a, _ = _eval_ds(synth_root, codec_sim=True, codec_seed=0)
    ds_b, _ = _eval_ds(synth_root, codec_sim=True, codec_seed=0)
    changed = 0
    for i in range(len(files)):
        xc, kc = ds_clean[i]
        xa, ka = ds_a[i]
        xb, kb = ds_b[i]
        assert ka == kb == kc
        assert xa.shape == xc.shape == (64600,)
        # identical across dataset instances (deterministic protocol)
        np.testing.assert_array_equal(xa, xb)
        if not np.array_equal(xa, xc):
            changed += 1
            # band-limiting removes high-frequency energy: the compressed
            # rendition must have less power above 4 kHz than the clean one
            spec_c = np.abs(np.fft.rfft(xc.astype(np.float64)))
            spec_a = np.abs(np.fft.rfft(xa.astype(np.float64)))
            cut = len(spec_c) // 2  # 4 kHz bin at 16 kHz sample rate
            assert spec_a[cut:].sum() < 0.5 * spec_c[cut:].sum() + 1e-9
    # inner_p defaults to 1.0: every utterance compressed
    assert changed == len(files)


def test_compressed_eval_inner_p_half_changes_subset(synth_root):
    ds_clean, files = _eval_ds(synth_root)
    ds_half, _ = _eval_ds(synth_root, codec_sim=True, codec_inner_p=0.5)
    changed = sum(
        not np.array_equal(ds_half[i][0], ds_clean[i][0])
        for i in range(len(files))
    )
    assert 0 < changed < len(files)


def test_compressed_batcher_falls_back_to_python_path(synth_root):
    # native loader pads during decode, so the compressed dataset must
    # decline the native batch path and still batch correctly
    ds, files = _eval_ds(synth_root, codec_sim=True)
    assert ds.native_batch(0, 4) is None
    batches = list(EvalBatcher(ds, batch_size=4))
    keys = [k for _, ks, _ in batches for k in ks]
    assert keys == files


def test_config_knobs_parse():
    cfg = ExperimentConfig.from_dict(
        {
            "batch_size": 4,
            "model_config": {"architecture": "AASIST"},
            "test_config": {
                "batch_size": 8,
                "codec_sim": "True",
                "eval_compressed": True,
                "codec_seed": 3,
                "codec_inner_p": 0.5,
            },
        }
    )
    assert cfg.test.codec_sim is True
    assert cfg.test.eval_compressed is True
    assert cfg.test.codec_seed == 3
    assert cfg.test.codec_inner_p == 0.5
    # defaults stay off
    cfg2 = ExperimentConfig.from_dict(
        {"batch_size": 4, "model_config": {"architecture": "AASIST"}}
    )
    assert cfg2.test.codec_sim is False and cfg2.test.eval_compressed is False


@pytest.mark.slow
def test_build_compressed_eval_batcher(synth_root):
    from rade_tpu.train.loop import Experiment

    cfg = ExperimentConfig.from_dict(
        {
            "batch_size": 4,
            "track": "LA",
            "model_config": {
                "architecture": "AASIST",
                "nb_samp": 16000,
                "filts": [4, [1, 4], [4, 4], [4, 8], [8, 8]],
                "gat_dims": [8, 8],
                "pool_ratios": [0.5, 0.5, 0.5, 0.5],
                "temperatures": [2.0, 2.0, 100.0, 100.0],
            },
            "test_config": {"batch_size": 4, "eval_compressed": True},
        }
    )
    exp = Experiment(cfg, seed=0)
    batcher, proto = exp.build_compressed_eval(synth_root)
    assert proto.exists()
    xb, keys, n_valid = next(iter(batcher))
    assert xb.shape == (4, 16000) and n_valid == 4

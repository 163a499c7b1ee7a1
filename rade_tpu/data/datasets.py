"""Dataset objects for ASVspoof 2019 / 2021 / In-the-Wild (torch-free).

Host-side counterparts of the reference's torch Datasets
(`/root/reference/src/data_utils.py:130-271`), returning numpy arrays.  The
augmentation chain (RawBoost -> codec-sim -> random pad) runs here exactly as
in the reference's `Dataset_ASVspoof2019_train.__getitem__`; batching and
device transfer live in `pipeline.py`.
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Dict, List, Sequence, Tuple, Union

import numpy as np

from rade_tpu.augment.codec import apply_codec_sim
from rade_tpu.augment.rawboost import RawBoost
from .audio_io import read_utterance, resample_poly
from .padding import MAX_LEN, pad, pad_random

PathLike = Union[str, Path]


def _resolve_native_paths(
    base: Path, keys: Sequence[str]
) -> "list[str] | None":
    """Resolve every key to a file the native loader decodes (.flac/.wav).

    Returns None when any key resolves to an unsupported format (.npy) or
    is missing — callers then fall back to the per-sample Python path,
    which raises its usual FileNotFoundError at access time.
    """
    out: list[str] = []
    for key in keys:
        for ext in (".flac", ".wav"):
            p = base / f"{key}{ext}"
            if p.exists():
                out.append(str(p))
                break
        else:
            return None
    return out


class TrainDataset:
    """ASVspoof2019 train set with per-item RawBoost + codec augmentation."""

    def __init__(
        self,
        keys: Sequence[str],
        labels: Dict[str, int],
        base_dir: PathLike,
        algo: int = 0,
        use_codec: bool = False,
        codec_p: float = 0.5,
        rawboost_p: float = 1.0,
        cut: int = MAX_LEN,
        seed: int = 0,
    ):
        self.keys = list(keys)
        self.labels = labels
        self.base_dir = Path(base_dir)
        self.cut = cut
        self.algo = algo
        self.use_codec = use_codec
        self.codec_p = float(codec_p)
        self.rawboost_p = float(rawboost_p)
        self.rng = np.random.RandomState(seed)
        self.rawboost = RawBoost.from_algo(algo, rng=self.rng) if algo != 0 else None

    def __len__(self) -> int:
        return len(self.keys)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, int]:
        key = self.keys[index]
        x, _ = read_utterance(self.base_dir, key)
        if self.rawboost is not None and self.rng.rand() < self.rawboost_p:
            try:
                x = self.rawboost.process(x)
            except Exception:
                pass  # reference falls back to clean audio on RawBoost failure
        if self.use_codec and self.rng.rand() < self.codec_p:
            x = apply_codec_sim(x, rng=self.rng)
        x = pad_random(x, self.cut, rng=self.rng)
        return x.astype(np.float32), self.labels[key]

    # ------------------------------------------------------- native batch path
    _native_paths: "list[str] | None | bool" = False  # False = not probed yet

    def native_batch(
        self, idxs: np.ndarray, rng: np.random.RandomState
    ) -> "Tuple[np.ndarray, np.ndarray] | None":
        """Batch-level decode+pad in the native C++ thread pool.

        Replaces the reference's DataLoader worker-process fan-out
        (`/root/reference/src/main.py:914-953`): the whole micro-batch is
        read, FLAC/WAV-decoded and random-cropped by `librade_loader.so`
        into one (N, T) float32 buffer, releasing the GIL.

        Host RawBoost/codec augmentation, when enabled, is applied on the
        cropped rows afterwards.  NOTE the documented deviation: the
        reference augments the FULL waveform and then crops
        (`src/data_utils.py:163-181`); augmenting the 64600-sample crop
        differs only in the FIR transient at the row edge and in RMS
        normalization over the crop instead of the full utterance.

        Returns None when the files aren't natively decodable (e.g. .npy
        synthetic sets) — callers fall back to the per-sample Python path.
        """
        if self._native_paths is False:
            self._native_paths = _resolve_native_paths(
                self.base_dir / "flac", self.keys
            )
        if self._native_paths is None:
            return None
        from rade_tpu.native.loader import batch_load

        paths = [self._native_paths[int(i)] for i in idxs]
        u = rng.rand(len(paths))
        xs, _ = batch_load(paths, self.cut, u_starts=u)
        ys = np.asarray(
            [self.labels[self.keys[int(i)]] for i in idxs], dtype=np.int32
        )
        if self.rawboost is not None or self.use_codec:
            for r in range(xs.shape[0]):
                x = xs[r].astype(np.float64)
                changed = False
                if self.rawboost is not None and self.rng.rand() < self.rawboost_p:
                    try:
                        x = self.rawboost.process(x)
                        changed = True
                    except Exception:
                        pass  # reference falls back to clean audio
                if self.use_codec and self.rng.rand() < self.codec_p:
                    x = apply_codec_sim(x, rng=self.rng)
                    changed = True
                if changed:
                    xs[r] = pad(x, self.cut).astype(np.float32)
        return xs, ys

    def load_clean(self, index: int) -> Tuple[np.ndarray, int]:
        """CLEAN waveform cropped/tiled to `cut` + label, for the cache.

        The device-resident dataset cache path (`data_config.device_cache`)
        uploads these once; the random-crop augmentation (`pad_random`)
        becomes an on-device per-sample circular time shift, and
        RawBoost/codec run on device (`on_device_aug`).

        Long utterances get a RANDOM (seeded) crop start, not `pad`'s head
        crop — a head crop would permanently hide all audio beyond the
        first ~4 s from training.  The start is still fixed for the run
        (host `pad_random` re-draws it every epoch): that residual
        divergence is inherent to caching one copy and is documented on the
        `device_cache` config flag.
        """
        key = self.keys[index]
        x, _ = read_utterance(self.base_dir, key)
        if len(x) > self.cut:
            start = self.rng.randint(0, len(x) - self.cut + 1)
            x = x[start:start + self.cut]
        return pad(x, self.cut).astype(np.float32), self.labels[key]


class EvalDataset:
    """Dev/eval set: deterministic padding, returns (waveform, utt_key).

    ``codec_sim=True`` scores the COMPRESSED protocol (the reference's
    second headline column, `/root/reference/README.md:92`): each utterance
    is band-limited by the codec simulation (16k -> {8k,6k,4k} -> 16k,
    `src/data_utils.py:31-59`) with a rate drawn DETERMINISTICALLY from
    (utt_id, codec_seed) so repeated evals and different models see the
    identical compressed rendition.  ``codec_inner_p`` defaults to 1.0 —
    every trial compressed — which is the conservative reading of the
    reference's "codec-simulated protocol"; set 0.5 to mirror the training
    augmentation's inner probability instead.
    """

    def __init__(
        self,
        keys: Sequence[str],
        base_dir: PathLike,
        cut: int = MAX_LEN,
        zero_pad_on_error: bool = False,
        codec_sim: bool = False,
        codec_seed: int = 0,
        codec_inner_p: float = 1.0,
    ):
        self.keys = list(keys)
        self.base_dir = Path(base_dir)
        self.cut = cut
        self.zero_pad_on_error = zero_pad_on_error
        self.codec_sim = bool(codec_sim)
        self.codec_seed = int(codec_seed)
        self.codec_inner_p = float(codec_inner_p)

    def __len__(self) -> int:
        return len(self.keys)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, str]:
        key = self.keys[index]
        try:
            x, _ = read_utterance(self.base_dir, key)
        except Exception:
            if not self.zero_pad_on_error:
                raise
            # 2021-eval behavior: unreadable audio -> zeros (data_utils.py:221-228)
            x = np.zeros(self.cut, dtype=np.float64)
        if self.codec_sim:
            from rade_tpu.augment.codec import codec_rng_for_utt

            x = apply_codec_sim(
                x,
                inner_p=self.codec_inner_p,
                rng=codec_rng_for_utt(key, self.codec_seed),
            )
        return pad(x, self.cut).astype(np.float32), key

    # ------------------------------------------------------- native batch path
    _native_paths: "list[str] | None | bool" = False

    def native_batch(
        self, lo: int, hi: int
    ) -> "Tuple[np.ndarray, List[str]] | None":
        """Native batched decode with deterministic eval padding.

        ``zero_pad_on_error`` maps to the loader's lenient mode (zero rows
        for unreadable files — the 2021-eval fallback,
        `/root/reference/src/data_utils.py:221-228`); otherwise a decode
        failure raises like the Python path does.

        The compressed protocol (``codec_sim``) resamples the FULL waveform
        before the deterministic pad, so it takes the per-sample Python
        path (the native loader pads during decode).
        """
        if self.codec_sim:
            return None
        if self._native_paths is False:
            self._native_paths = _resolve_native_paths(
                self.base_dir / "flac", self.keys
            )
        if self._native_paths is None:
            return None
        from rade_tpu.native.loader import batch_load

        xs, _ = batch_load(
            self._native_paths[lo:hi], self.cut,
            lenient=self.zero_pad_on_error,
        )
        return xs, self.keys[lo:hi]


class InTheWildDataset:
    """In-the-Wild set from a meta.csv with ``file,label`` columns.

    NOTE the inverted label convention of the reference
    (`src/data_utils.py:259`): ``bona-fide`` -> 0, spoof -> 1.
    """

    def __init__(
        self,
        meta_csv: PathLike,
        base_dir: PathLike,
        sample_rate: int = 16000,
        cut: int = MAX_LEN,
    ):
        self.base_dir = Path(base_dir)
        self.sample_rate = sample_rate
        self.cut = cut
        self.files: List[str] = []
        self.labels: List[str] = []
        with open(meta_csv, newline="") as f:
            reader = csv.DictReader(f)
            if reader.fieldnames is None or not {"file", "label"}.issubset(
                reader.fieldnames
            ):
                raise ValueError("meta.csv must contain 'file' and 'label' columns")
            for row in reader:
                self.files.append(row["file"])
                self.labels.append(row["label"])

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, int, str]:
        fname = self.files[index]
        label = 0 if self.labels[index].lower() == "bona-fide" else 1
        try:
            from .audio_io import read_audio

            x, sr = read_audio(self.base_dir / fname)
            if sr != self.sample_rate:
                x = resample_poly(x, sr, self.sample_rate)
        except Exception:
            x = np.zeros(self.cut, dtype=np.float64)
        return pad(x, self.cut).astype(np.float32), label, fname

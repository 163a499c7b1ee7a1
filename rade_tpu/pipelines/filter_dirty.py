"""Dirty-data filter: rank training samples by model loss, write a cleaned protocol.

Port of `/root/reference/src/filter_dirty_data.py`: load a trained checkpoint,
compute per-sample CE loss over the *unaugmented* train set, sort descending,
and write ``dirty_samples.txt`` (top ratio) plus a cleaned protocol that
preserves the original protocol lines for the kept keys.

Usage:
  python -m rade_tpu.pipelines.filter_dirty --config C --weights W \
      [--ratio 0.02] [--out_dir D]
"""

from __future__ import annotations

import argparse
from pathlib import Path
from typing import List, Tuple

import numpy as np

from rade_tpu.config import ExperimentConfig, load_config
from rade_tpu.data.datasets import TrainDataset
from rade_tpu.data.protocols import parse_protocol_labeled


def rank_samples_by_loss(
    cfg: ExperimentConfig, weights_path: str = "", seed: int = 1234
) -> Tuple[List[str], np.ndarray, Path]:
    """-> (keys sorted by loss desc, losses in that order, train protocol path)."""
    import jax
    import jax.numpy as jnp

    from rade_tpu.train.checkpoint import load_eval_weights
    from rade_tpu.train.loop import Experiment

    exp = Experiment(cfg, seed=seed)
    if weights_path and Path(weights_path).exists():
        exp.params, exp.batch_stats = load_eval_weights(
            weights_path,
            {"model": exp.params["model"], "loss": exp.params["loss"]},
            exp.batch_stats,
        )

    db = Path(cfg.database_path)
    track = cfg.track
    proto = (
        db / f"ASVspoof2019_{track}_cm_protocols"
        / f"ASVspoof2019.{track}.cm.train.trn.txt"
    )
    labels, files = parse_protocol_labeled(proto)
    # no augmentation: per-sample loss on clean audio (reference :112-117)
    ds = TrainDataset(
        files, labels, db / f"ASVspoof2019_{track}_train",
        algo=0, use_codec=False, cut=exp.nb_samp, seed=seed,
    )

    model = exp.model

    @jax.jit
    def per_sample_ce(params, batch_stats, x, y):
        _, logits = model.apply(
            {"params": params["model"], "batch_stats": batch_stats}, x, train=False
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.take_along_axis(logp, y[:, None], axis=1)[:, 0]

    losses = np.zeros(len(files), dtype=np.float64)
    bs = cfg.test.batch_size
    for b_start in range(0, len(files), bs):
        idxs = range(b_start, min(b_start + bs, len(files)))
        xs = np.stack([ds[i][0] for i in idxs])
        ys = np.asarray([ds[i][1] for i in idxs], dtype=np.int32)
        if xs.shape[0] < bs:
            pad = bs - xs.shape[0]
            xs = np.concatenate([xs, np.zeros((pad,) + xs.shape[1:], xs.dtype)])
            ys = np.concatenate([ys, np.zeros(pad, ys.dtype)])
        out = np.asarray(per_sample_ce(exp.params, exp.batch_stats, xs, ys))
        losses[b_start : b_start + len(idxs)] = out[: len(idxs)]

    order = np.argsort(-losses, kind="mergesort")
    return [files[i] for i in order], losses[order], proto


def write_filtered_protocol(
    proto_path, sorted_keys: List[str], ratio: float, out_dir
) -> Tuple[Path, Path]:
    """Write dirty list + cleaned protocol preserving the original lines."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    n_dirty = int(len(sorted_keys) * ratio)
    dirty = set(sorted_keys[:n_dirty])

    dirty_path = out_dir / f"dirty_samples_top{ratio:g}.txt"
    dirty_path.write_text("\n".join(sorted_keys[:n_dirty]) + "\n")

    clean_path = out_dir / "train_cleaned_protocol.txt"
    with open(proto_path) as fin, open(clean_path, "w") as fout:
        for line in fin:
            parts = line.strip().split(" ")
            if len(parts) == 5 and parts[1] in dirty:
                continue
            if line.strip():
                fout.write(line if line.endswith("\n") else line + "\n")
    return dirty_path, clean_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--weights", default="")
    ap.add_argument("--ratio", type=float, default=0.02)
    ap.add_argument("--out_dir", default="./filtered")
    ap.add_argument("--seed", type=int, default=1234)
    args = ap.parse_args()
    cfg = load_config(args.config)
    keys, losses, proto = rank_samples_by_loss(cfg, args.weights, args.seed)
    dirty, clean = write_filtered_protocol(proto, keys, args.ratio, args.out_dir)
    print(f"dirty list -> {dirty}")
    print(f"cleaned protocol -> {clean}")


if __name__ == "__main__":
    main()

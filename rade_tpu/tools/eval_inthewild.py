"""In-the-Wild cross-domain evaluation.

Scores the In-the-Wild dataset (meta.csv with ``file,label`` columns; labels
``bona-fide``/``spoof``) with a trained checkpoint and reports the min-flip
EER.  Covers the reference's `Dataset_InTheWild` capability
(`/root/reference/src/data_utils.py:233-271` — note its inverted label
convention: ``bona-fide`` -> 0).

Usage:
  python -m rade_tpu.tools.eval_inthewild --config C --weights W \
      --meta_csv meta.csv --audio_dir DIR [--out scores.txt]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def evaluate(cfg, weights: str, meta_csv: str, audio_dir: str, out_path=None, seed=0):
    from rade_tpu.data.datasets import InTheWildDataset
    from rade_tpu.evaluate.metrics import compute_eer_minflip
    from rade_tpu.train.checkpoint import load_eval_weights
    from rade_tpu.train.loop import Experiment

    exp = Experiment(cfg, seed=seed)
    if weights and Path(weights).exists():
        exp.params, exp.batch_stats = load_eval_weights(
            weights,
            {"model": exp.params["model"], "loss": exp.params["loss"]},
            exp.batch_stats,
        )

    ds = InTheWildDataset(meta_csv, audio_dir, cut=exp.nb_samp)
    bs = cfg.test.batch_size
    scores, labels, fnames = [], [], []
    for start in range(0, len(ds), bs):
        items = [ds[i] for i in range(start, min(start + bs, len(ds)))]
        xs = np.stack([it[0] for it in items])
        if xs.shape[0] < bs:
            xs = np.concatenate(
                [xs, np.zeros((bs - xs.shape[0],) + xs.shape[1:], xs.dtype)]
            )
        s = np.asarray(exp.eval_step(exp.params, exp.batch_stats, xs))[: len(items)]
        scores.extend(s.tolist())
        labels.extend(it[1] for it in items)
        fnames.extend(it[2] for it in items)

    scores = np.asarray(scores)
    labels = np.asarray(labels)
    # ITW convention: label 0 = bona-fide (inverted vs 2019)
    bona = scores[labels == 0]
    spoof = scores[labels == 1]
    eer = compute_eer_minflip(bona, spoof)

    if out_path:
        with open(out_path, "w") as f:
            for fname, s in zip(fnames, scores):
                f.write(f"{fname} {s}\n")
    return eer, len(bona), len(spoof)


def main():
    from rade_tpu.config import load_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--weights", default="")
    ap.add_argument("--meta_csv", required=True)
    ap.add_argument("--audio_dir", required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    cfg = load_config(args.config)
    eer, nb, ns = evaluate(cfg, args.weights, args.meta_csv, args.audio_dir, args.out)
    print(f"In-the-Wild EER: {eer:.3f}% ({nb} bona-fide, {ns} spoof)")


if __name__ == "__main__":
    main()

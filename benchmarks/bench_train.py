"""Training-throughput benchmark: flagship Phase-6 train step, utt/s/chip.

The reference's epoch throughput baseline is 15-30 min/epoch for ~25,380
train utterances on an RTX 4090D (`docs/README_TRAINING.md:55-58`), i.e.
~14-28 utt/s. The BASELINE target is >=10x that per chip.

Run on real TPU:  python benchmarks/bench_train.py [--tiny]
Prints one JSON line: {"metric": "train_throughput_utt_per_sec_per_chip", ...}
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

REFERENCE_TRAIN_UTT_PER_SEC = 28.0  # best case of 15 min/epoch for 25,380 utts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="CPU-sized smoke run")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=0, help="override micro-batch size")
    ap.add_argument("--accum", type=int, default=0, help="override accumulation steps")
    ap.add_argument("--no-fgm", action="store_true", help="disable FGM for A/B runs")
    ap.add_argument(
        "--scan-layers", action="store_true",
        help="stacked nn.scan WavLM encoder (much faster compiles)",
    )
    args = ap.parse_args()

    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as ge
    from rade_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from rade_tpu.train.loop import Experiment

    cfg = ge._phase6_cfg(tiny=args.tiny)
    if args.batch:
        cfg.batch_size = args.batch
    if args.accum:
        cfg.training.accumulation_steps = args.accum
    if args.no_fgm:
        cfg.training.use_fgm = False
    if args.scan_layers:
        cfg.model_config["wavlm_scan_layers"] = True
    mesh = make_mesh()
    exp = Experiment(cfg, seed=0, mesh=mesh)
    state = exp.setup_training(steps_per_epoch=100)

    accum = max(1, cfg.training.accumulation_steps)
    micro_bs = cfg.batch_size
    T = int(cfg.model_config["nb_samp"])
    rng = np.random.RandomState(0)
    sh = NamedSharding(mesh, P(None, DATA_AXIS))
    xs = jax.device_put(rng.randn(accum, micro_bs, T).astype(np.float32) * 0.1, sh)
    ys = jax.device_put(rng.randint(0, 2, (accum, micro_bs)).astype(np.int32), sh)

    # compile + warmup with a readback fence
    state, metrics = exp.train_step(state, xs, ys)
    float(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, metrics = exp.train_step(state, xs, ys)
    loss = float(metrics["loss"])  # fence
    dt = time.perf_counter() - t0

    utt_per_step = accum * micro_bs
    utt_per_sec = args.iters * utt_per_step / dt
    n_chips = mesh.devices.size
    print(
        json.dumps(
            {
                "metric": "train_throughput_utt_per_sec_per_chip",
                "value": round(utt_per_sec / n_chips, 2),
                "unit": f"utt/s/chip (micro_bs={micro_bs}, accum={accum}, T={T})",
                "vs_baseline": round(utt_per_sec / n_chips / REFERENCE_TRAIN_UTT_PER_SEC, 3),
                "loss": round(loss, 5),
            }
        )
    )


if __name__ == "__main__":
    main()

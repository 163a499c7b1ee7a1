"""Sustained LA-size epoch throughput on the real chip (VERDICT r2 item 1).

The round-2 epoch numbers came from a 400-utterance synthetic set; this
drives the FULL Phase-6 recipe over an **LA-size train split (25,380
utterances of real-LA-like log-normal durations, FLAC)** and reports the
sustained epoch loop rate for:

- the int16 device cache (the shipped Phase6_TPU.conf default: one-time
  decode + 3.3 GB HBM upload, zero per-step host bytes), and
- the host path (native C++ batched decode + prefetch) when --host is given
  (what a >4 GB-cap or multi-host run falls back to).

Generate the dataset first (about 10 minutes, one-time):
    python -m rade_tpu.tools.synth_dataset --out /root/data/la_full \
        --la-size --train-only --n 64 --format flac --seed 7

Run:
    python benchmarks/bench_epoch_lasize.py --db /root/data/la_full \
        [--epochs 2] [--host] [--steps-cap N]

The meaningful comparison is epoch utt/s vs the fenced step bench
(benchmarks/bench_train.py, 49.4 utt/s): an epoch rate at/near the step
rate means the data path adds nothing.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default="/root/data/la_full")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--host", action="store_true",
                    help="force the host pipeline (device_cache off)")
    ap.add_argument("--steps-cap", type=int, default=0,
                    help="stop each epoch after N optimizer steps (0 = full)")
    args = ap.parse_args()

    import jax

    import __graft_entry__ as ge
    from rade_tpu.train.loop import Experiment

    cfg = ge._phase6_cfg(tiny=False)
    cfg.database_path = args.db.rstrip("/") + "/"
    if args.host:
        cfg.data.device_cache = False

    # fast_init: throughput is init-value independent, and the real init
    # costs ~1 min (CPU backend) to ~5 min (relay compile) of dead time
    exp = Experiment(cfg, seed=0, fast_init=True)
    t0 = time.perf_counter()
    trn, _dev, _evl, _dev_proto, _eval_proto = exp.build_loaders(cfg.database_path)
    n = len(trn.dataset)
    print(f"train set: {n} utterances; loaders in {time.perf_counter()-t0:.1f}s")

    steps_per_epoch = max(
        1, n // (cfg.batch_size * max(1, cfg.training.accumulation_steps))
    )
    exp.setup_training(steps_per_epoch=steps_per_epoch)

    if args.steps_cap:
        # cap by truncating the epoch's index stream: wrap epoch_indices
        orig = trn.epoch_indices

        def capped(epoch):
            for i, idxs in enumerate(orig(epoch)):
                if i >= args.steps_cap * max(1, cfg.training.accumulation_steps):
                    return
                yield idxs

        trn.epoch_indices = capped
        orig_epoch = trn.epoch

        def capped_epoch(epoch):
            for i, b in enumerate(orig_epoch(epoch)):
                if i >= args.steps_cap * max(1, cfg.training.accumulation_steps):
                    return
                yield b

        trn.epoch = capped_epoch

    rates = []
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        loss = exp.train_one_epoch(trn, epoch=epoch)
        jax.tree.map(lambda x: x.block_until_ready(), exp.state.params)
        dt = time.perf_counter() - t0
        n_eff = (
            min(n, args.steps_cap * cfg.batch_size
                * max(1, cfg.training.accumulation_steps))
            if args.steps_cap else n
        )
        rate = n_eff / dt
        rates.append(rate)
        print(
            f"epoch {epoch}: {n_eff} utts in {dt:.1f}s = {rate:.1f} utt/s "
            f"(loss {loss:.4f})"
            + ("  [includes compile+cache build]" if epoch == 0 else "")
        )
    if len(rates) > 1:
        print(f"sustained (post-compile): {np.mean(rates[1:]):.1f} utt/s/chip")


if __name__ == "__main__":
    main()

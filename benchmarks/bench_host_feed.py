"""Host data-pipeline feed-rate benchmark at real dataset scale.

Measures how fast the host side can serve train micro-batches (decode FLAC +
crop/tile to 64600) — the role the reference fills with DataLoader worker
processes (`/root/reference/src/main.py:914-953`) and we fill with the native
C++ batched loader (rade_tpu/native/loader.cpp).  Run against an LA-size
synthetic FLAC set:

    python -m rade_tpu.tools.synth_dataset --out /tmp/la_full \\
        --la-size --train-only --n 64 --format flac --seed 7
    python benchmarks/bench_host_feed.py --db /tmp/la_full [--batches 200]

Prints utterances/sec for (a) the native batched path, (b) the per-sample
Python path, and (c) the native path through prefetch() as the train loop
consumes it.  The feed rate must exceed the jit'd step rate (bench_train.py)
for the host never to stall the TPU.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, ".")


def bench(
    db: str,
    batch_size: int,
    n_batches: int,
    threads: int | None,
    rawboost: bool = False,
):
    from rade_tpu.data.datasets import TrainDataset
    from rade_tpu.data.pipeline import TrainBatcher, prefetch
    from rade_tpu.data.protocols import parse_protocol_labeled

    root = Path(db)
    labels, files = parse_protocol_labeled(
        root / "ASVspoof2019_LA_cm_protocols/ASVspoof2019.LA.cm.train.trn.txt"
    )
    aug = (
        dict(algo=5, rawboost_p=0.8, use_codec=True, codec_p=0.3)
        if rawboost
        else {}
    )
    ds = TrainDataset(
        files, labels, root / "ASVspoof2019_LA_train", cut=64600, seed=0, **aug
    )
    print(f"train set: {len(ds)} utterances (host aug: {rawboost})")
    if threads is not None:
        import os

        os.environ["RADE_LOADER_THREADS"] = str(threads)

    results = {}

    def run(tag, native, use_prefetch=False, limit=n_batches):
        b = TrainBatcher(ds, batch_size, seed=1, native=native)
        it = b.epoch(0)
        if use_prefetch:
            it = prefetch(it, depth=4)
        # warmup (path resolution etc.)
        next(it)
        t0 = time.perf_counter()
        n = 0
        for i, (x, y) in enumerate(it):
            assert x.shape == (batch_size, 64600)
            n += batch_size
            if i + 1 >= limit:
                break
        dt = time.perf_counter() - t0
        rate = n / dt
        results[tag] = rate
        print(f"{tag:30s} {rate:10.1f} utt/s  ({n} utts in {dt:.2f}s)")
        return rate

    run("native batched (C++ pool)", native=True)
    run("native + prefetch thread", native=True, use_prefetch=True)
    run("python per-sample", native=False, limit=max(4, n_batches // 10))
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", required=True)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--batches", type=int, default=200)
    ap.add_argument("--threads", type=int, default=None)
    ap.add_argument("--rawboost", action="store_true",
                    help="host RawBoost(algo5,p=.8)+codec(p=.3) on top")
    args = ap.parse_args()
    bench(args.db, args.batch_size, args.batches, args.threads, args.rawboost)


if __name__ == "__main__":
    main()

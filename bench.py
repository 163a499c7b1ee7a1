"""Benchmark: flagship-model scoring + training throughput (utt/sec/chip).

Prints EXACTLY ONE JSON line:
  {"metric": ..., "value": N, "unit": "...", "vs_baseline": N,
   "train_utt_per_sec_per_chip": N, "train_vs_baseline": N}
The train fields are measured unless RADE_BENCH_SKIP_TRAIN is set; if the
training bench fails (OOM / compile), the line still carries the inference
number so the record is never lost.

Baselines (BASELINE.md): inference ~40 ms/sample at batch 32 on a V100
(`/root/reference/README.md:99-105`) = 25 utt/s; training 14-28 utt/s on an
RTX 4090D with FGM (15-30 min/epoch over 25,380 utts) — we take the
midpoint, 21 utt/s.  Both measured on the jit'd step, real hardware,
64600-sample utterances, the shipped Phase6_TPU.conf recipe.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

REFERENCE_UTT_PER_SEC = 25.0  # V100, Phase-6, 40 ms/sample @ bs=32
REFERENCE_TRAIN_UTT_PER_SEC = 21.0  # RTX 4090D, Phase-6 w/ FGM, midpoint


def bench_train() -> float:
    """Full Phase-6 train-step throughput (utt/s/chip), FGM included."""
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from rade_tpu.train.loop import Experiment

    cfg = ge._phase6_cfg(tiny=False)
    exp = Experiment(cfg, seed=0)
    state = exp.setup_training(steps_per_epoch=100)

    accum = max(1, cfg.training.accumulation_steps)
    micro_bs = cfg.batch_size
    T = int(cfg.model_config.get("nb_samp", 64600))
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(accum, micro_bs, T).astype(np.float32) * 0.1)
    ys = jnp.asarray(rng.randint(0, 2, (accum, micro_bs)).astype(np.int32))
    ws = jnp.ones((accum,), jnp.float32)

    state, metrics = exp.train_step(state, xs, ys, ws)  # compile
    np.asarray(metrics["loss"])
    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = exp.train_step(state, xs, ys, ws)
    np.asarray(metrics["loss"])  # fence
    dt = (time.perf_counter() - t0) / n
    return micro_bs * accum / dt


def main() -> None:
    import jax

    import __graft_entry__ as ge

    forward, (variables, x) = ge.entry()
    fwd = jax.jit(forward)
    # batch 32 matches the reference's latency protocol (V100, bs=32) and
    # fits the v5e's 16GB HBM on the full-bf16 path
    target_bs = 32
    batch = x.shape[0]
    if batch != target_bs:
        x = jax.numpy.tile(x, (max(1, target_bs // batch), 1))[:target_bs]
        batch = x.shape[0]

    # compile + warmup — np.asarray is a hard fence (device->host readback);
    # on the axon relay, block_until_ready acks enqueue rather than completion
    np.asarray(fwd(variables, x))
    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fwd(variables, x)
    np.asarray(out)  # fence: forces all queued executions to finish
    dt = time.perf_counter() - t0

    utt_per_sec = n_iters * batch / dt
    record = {
        "metric": "inference_throughput_utt_per_sec_per_chip",
        "value": round(utt_per_sec, 2),
        "unit": f"utt/s/chip (bs={batch}, 64600 samples)",
        "vs_baseline": round(utt_per_sec / REFERENCE_UTT_PER_SEC, 3),
    }
    if not os.environ.get("RADE_BENCH_SKIP_TRAIN"):
        try:
            train_ups = bench_train()
            record["train_utt_per_sec_per_chip"] = round(train_ups, 2)
            record["train_vs_baseline"] = round(
                train_ups / REFERENCE_TRAIN_UTT_PER_SEC, 3
            )
        except Exception as e:  # OOM / compile failure must not lose the record
            record["train_bench_error"] = type(e).__name__
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()

"""Benchmark: flagship-model scoring + training throughput (utt/sec/chip).

Timeout-safe by construction (round-3 lesson: the driver run hit rc=124 and
recorded NOTHING because the old version printed a single JSON line only at
the very end).  This version:

1. prints the inference JSON record THE MOMENT it is measured (the driver
   parses the LAST parseable line, so a later combined record supersedes it);
2. runs a daemon watchdog that, at ``RADE_BENCH_DEADLINE_S`` (default 420 s)
   after process start, prints the best record measured so far and hard-exits
   0 — so even a hung XLA compile cannot lose the round's numbers;
3. logs stage-timestamped progress to stderr (import / init / infer-compile /
   infer / train-setup / train-compile / train) so any future rc=124 is
   diagnosable from the tail.

Output: one JSON object per line; the last line is the most complete:
  {"metric": "inference_throughput_utt_per_sec_per_chip", "value": N,
   "unit": "...", "vs_baseline": N,
   "train_utt_per_sec_per_chip": N, "train_vs_baseline": N, ...}

Baselines (BASELINE.md): inference ~40 ms/sample at batch 32 on a V100
(`/root/reference/README.md:99-105`) = 25 utt/s; training 14-28 utt/s on an
RTX 4090D with FGM (15-30 min/epoch over 25,380 utts,
`/root/reference/docs/README_TRAINING.md:55-58`) — midpoint 21 utt/s.  Both
measured on the jit'd step, real hardware, 64600-sample utterances, the
shipped Phase6_TPU.conf recipe.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

T0 = time.monotonic()
DEADLINE_S = float(os.environ.get("RADE_BENCH_DEADLINE_S", "420"))

REFERENCE_UTT_PER_SEC = 25.0  # V100, Phase-6, 40 ms/sample @ bs=32
REFERENCE_TRAIN_UTT_PER_SEC = 21.0  # RTX 4090D, Phase-6 w/ FGM, midpoint

_lock = threading.Lock()
_best_record: dict | None = None  # last record printed; watchdog re-prints it
_done = False


def _elapsed() -> float:
    return time.monotonic() - T0


def _remaining() -> float:
    return DEADLINE_S - _elapsed()


def _log(msg: str) -> None:
    print(f"[bench t={_elapsed():6.1f}s] {msg}", file=sys.stderr, flush=True)


def _emit(record: dict) -> None:
    """Print a record line and remember it for the watchdog."""
    global _best_record
    with _lock:
        _best_record = dict(record)
        print(json.dumps(record), flush=True)


def _watchdog() -> None:
    wait = _remaining()
    if wait > 0:
        time.sleep(wait)
    with _lock:
        if _done:
            return
        if _best_record is not None:
            rec = dict(_best_record)
            rec["bench_deadline_hit"] = True
            print(json.dumps(rec), flush=True)
        print(
            f"[bench t={_elapsed():6.1f}s] DEADLINE ({DEADLINE_S}s) hit — "
            "emitted best-known record and exiting",
            file=sys.stderr,
            flush=True,
        )
        sys.stderr.flush()
        sys.stdout.flush()
    os._exit(0)


def bench_train(record: dict) -> None:
    """Full Phase-6 train-step throughput (utt/s/chip), FGM included.

    Mutates ``record`` in place as milestones land, so the watchdog's
    snapshot carries stage timings even if a later stage hangs.
    """
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge
    from rade_tpu.train.loop import Experiment

    _log("train: building experiment (shipped Phase6_TPU.conf)")
    cfg = ge._phase6_cfg(tiny=False)
    # fast_init: shape-materialized params (throughput is init-value
    # independent; the real init costs ~330 s of relay compile — round-3's
    # rc=124 root cause)
    exp = Experiment(cfg, seed=0, fast_init=True)
    state = exp.setup_training(steps_per_epoch=100)
    record["t_train_setup_s"] = round(_elapsed(), 1)
    _log("train: state ready; tracing + compiling train step")

    accum = max(1, cfg.training.accumulation_steps)
    micro_bs = cfg.batch_size
    T = int(cfg.model_config.get("nb_samp", 64600))
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(accum, micro_bs, T).astype(np.float32) * 0.1)
    ys = jnp.asarray(rng.randint(0, 2, (accum, micro_bs)).astype(np.int32))
    ws = jnp.ones((accum,), jnp.float32)

    t_c = time.monotonic()
    state, metrics = exp.train_step(state, xs, ys, ws)  # compile
    np.asarray(metrics["loss"])
    record["t_train_compile_s"] = round(time.monotonic() - t_c, 1)
    _log(f"train: compiled+warm in {record['t_train_compile_s']}s; measuring")

    # measure with however many iterations the remaining budget allows
    n = 8 if _remaining() > 30 else 3
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = exp.train_step(state, xs, ys, ws)
    np.asarray(metrics["loss"])  # fence (axon acks enqueue on block_until_ready)
    dt = (time.perf_counter() - t0) / n
    ups = micro_bs * accum / dt
    record["train_utt_per_sec_per_chip"] = round(ups, 2)
    record["train_vs_baseline"] = round(ups / REFERENCE_TRAIN_UTT_PER_SEC, 3)
    record["train_ms_per_step"] = round(dt * 1e3, 1)
    _log(f"train: {dt * 1e3:.1f} ms/step = {ups:.2f} utt/s/chip (n={n})")


def main() -> None:
    global _done
    threading.Thread(target=_watchdog, daemon=True).start()
    _log(f"start (deadline {DEADLINE_S}s); importing jax")

    import jax
    import numpy as np

    import __graft_entry__ as ge

    _log("jax imported; building flagship model + init")
    forward, (variables, x) = ge.entry()
    fwd = jax.jit(forward)
    # batch 32 matches the reference's latency protocol (V100, bs=32) and
    # fits the v5e's 16GB HBM on the full-bf16 path
    target_bs = 32
    batch = x.shape[0]
    if batch != target_bs:
        x = jax.numpy.tile(x, (max(1, target_bs // batch), 1))[:target_bs]
        batch = x.shape[0]
    _log("inference: compiling forward (bs=32)")

    # compile + warmup — np.asarray is a hard fence (device->host readback);
    # on the axon relay, block_until_ready acks enqueue rather than completion
    t_c = time.monotonic()
    np.asarray(fwd(variables, x))
    t_infer_compile = round(time.monotonic() - t_c, 1)
    _log(f"inference: compiled+warm in {t_infer_compile}s; measuring")
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
        "t_infer_compile_s": t_infer_compile,
    }
    # print the inference record IMMEDIATELY — the record is now un-losable
    _emit(record)
    _log(f"inference: {utt_per_sec:.2f} utt/s/chip — record emitted")

    if os.environ.get("RADE_BENCH_SKIP_TRAIN"):
        _log("RADE_BENCH_SKIP_TRAIN set; done")
    elif _remaining() < 60:
        record["train_bench_error"] = "skipped_low_budget"
        _log(f"train: skipped, only {_remaining():.0f}s left in budget")
        _emit(record)
    else:
        try:
            bench_train(record)
        except Exception as e:  # OOM / compile failure must not lose the record
            record["train_bench_error"] = type(e).__name__
            _log(f"train: FAILED with {type(e).__name__}: {e}")
        record["t_total_s"] = round(_elapsed(), 1)
        _emit(record)
    with _lock:
        _done = True
    _log("done")


if __name__ == "__main__":
    main()

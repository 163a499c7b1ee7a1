"""Benchmark: flagship-model training + scoring throughput (utt/sec/chip).

Timeout-safe by construction (round-3 lesson: the driver run hit rc=124 and
recorded NOTHING because the old version printed a single JSON line only at
the very end).  Round-5 lesson: measure the TRAIN step FIRST — it is the
long pole (compile measured 195-341 s vs 52 s for inference through the
relay), and rounds 3 and 4 both lost the official training number because
inference was measured first and the train compile ran out the deadline
(`BENCH_r04.json`: train compile finished at t=474 s of a 520 s budget,
warm-up still in flight at the watchdog).

Mechanisms:

1. TRAIN-MEASURED-FIRST ordering: the inference graph is COMPILED first
   (it is the short compile, 52-190 s vs 187-341 s, and all local
   train-bench setup hides under its remote wait), but the train step is
   the first thing EXECUTED and measured — a relay stall later can only
   cost the inference record, never the train one;
2. provisional 1-iteration records (marked ``"provisional": true`` so
   by-name consumers can't confuse them with the refined n-iter numbers —
   round-4 advisor) the moment ANY timed execute completes, for both
   benches: a cold execute can stall for minutes on relay weather, so the
   first completed iteration is immediately durable;
3. every record emitted after the train measure carries
   ``train_utt_per_sec_per_chip``, so whichever line is last parsed, the
   training number survives;
4. a daemon watchdog that, at ``RADE_BENCH_DEADLINE_S`` (default 550 s,
   inside the driver's ~600 s timeout) after process start, prints the
   best record measured so far — or an honest null record carrying the
   stage reached — and hard-exits 0;
5. stage-timestamped stderr progress so any future rc=124 is diagnosable
   from the tail;
6. relay discipline (measured round 4): trace everything early, ONE remote
   compile in flight at a time, device execution only between compiles —
   overlapping an execute with an in-flight compile hangs the client and a
   forced exit then wedges the relay for ~30 min.

Output: one JSON object per line; the last line is the most complete.

Baselines (BASELINE.md): training 14-28 utt/s on an RTX 4090D with FGM
(15-30 min/epoch over 25,380 utts,
`/root/reference/docs/README_TRAINING.md:55-58`) — midpoint 21 utt/s;
inference ~40 ms/sample at batch 32 on a V100
(`/root/reference/README.md:99-105`) = 25 utt/s.  Both measured on the
jit'd step, real hardware, 64600-sample utterances, the shipped
Phase6_TPU.conf recipe (LoRA adapters live in BOTH benches, like the
reference's Phase-6 eval path).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

T0 = time.monotonic()
# 575: the driver's timeout is ~600 s (round-3's un-watchdogged run was
# killed with rc=124 at ~600 s; round-4's watchdog exit at 520 s was
# captured cleanly), and the watchdog's emit+exit takes <1 s — so run the
# compile/measure pipeline as close to the wire as safely possible.  Under
# the worst measured relay weather both remote compiles in series cost
# 341 + 341 s; every extra second of budget is train-measure headroom.
DEADLINE_S = float(os.environ.get("RADE_BENCH_DEADLINE_S", "575"))

REFERENCE_UTT_PER_SEC = 25.0  # V100, Phase-6, 40 ms/sample @ bs=32
REFERENCE_TRAIN_UTT_PER_SEC = 21.0  # RTX 4090D, Phase-6 w/ FGM, midpoint

_lock = threading.Lock()
_best_record: dict | None = None  # last record printed; watchdog re-prints it
_done = False
_stage = ["start"]  # last stage reached, for the null diagnostic record
_shared_ref: list = [{}]


def _shared_view() -> dict:
    try:
        return dict(_shared_ref[0])
    except Exception:
        return {}


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
        else:
            # nothing measured: emit an honest null record carrying the
            # stage timings so the driver artifact is diagnosable (the
            # round-5 validation run died in a cold-execute stall during
            # train warm-up and recorded NOTHING)
            print(json.dumps({
                "metric": "train_throughput_utt_per_sec_per_chip",
                "value": None,
                "unit": "utt/s/chip (NOT MEASURED - deadline hit)",
                "vs_baseline": None,
                "bench_deadline_hit": True,
                "bench_stage": _stage[0],
                **_shared_view(),
            }), flush=True)
        print(
            f"[bench t={_elapsed():6.1f}s] DEADLINE ({DEADLINE_S}s) hit — "
            "emitted best-known record and exiting",
            file=sys.stderr,
            flush=True,
        )
        sys.stderr.flush()
        sys.stdout.flush()
    os._exit(0)


class _CompileJob(threading.Thread):
    """Remote-compile an already-lowered computation off the main thread."""

    def __init__(self, name, lowered):
        super().__init__(daemon=True, name=name)
        self.lowered = lowered
        self.compiled = None
        self.error: BaseException | None = None
        self.seconds = 0.0

    def run(self):
        t0 = time.monotonic()
        try:
            self.compiled = self.lowered.compile()
        except BaseException as e:  # noqa: BLE001 — recorded, re-raised on join
            self.error = e
        self.seconds = time.monotonic() - t0
        _log(f"{self.name}: compile done in {self.seconds:.1f}s"
             + (f" (ERROR {type(self.error).__name__})" if self.error else ""))


def main() -> None:
    global _done
    threading.Thread(target=_watchdog, daemon=True).start()
    _log(f"start (deadline {DEADLINE_S}s); importing jax")

    import jax
    import numpy as np

    import __graft_entry__ as ge

    _log("jax imported; building flagship model (shape-materialized params)")
    forward, (variables, x) = ge.entry()
    # batch 32 matches the reference's latency protocol (V100, bs=32) and
    # fits the v5e's 16GB HBM on the full-bf16 path
    target_bs = 32
    if x.shape[0] != target_bs:
        x = jax.numpy.tile(x, (max(1, target_bs // x.shape[0]), 1))[:target_bs]
    batch = x.shape[0]

    # Fields shared by every record from here on; train fields are merged in
    # as soon as they are measured so ANY later line carries them.
    shared: dict = {}
    _shared_ref[0] = shared

    # --- inference COMPILE first (the short compile: 52-190 s vs 187-341 s
    # for the train step), with ALL local train-bench setup riding under its
    # remote wait; the train step is still the first thing EXECUTED and
    # MEASURED (round-5 validation: serial setup (175 s of relay weather) +
    # train compile left the warm-up only 86 s of budget) ---
    _stage[0] = "tracing inference"
    _log("inference: tracing forward (bs=32), then remote compile")
    job_inf = _CompileJob("inference", jax.jit(forward).lower(variables, x))
    job_inf.start()

    # --- train bench: build + trace (local) under the inference compile ---
    lowered_train = None
    state = xs = ys = ws = None
    if not os.environ.get("RADE_BENCH_SKIP_TRAIN"):
        try:
            import jax.numpy as jnp

            from rade_tpu.train.loop import Experiment

            _log("train: building experiment (shipped Phase6_TPU.conf)")
            cfg = ge._phase6_cfg(tiny=False)
            # reuse the entry() shape-materialized variables: throughput is
            # init-value independent, and the real init costs ~330 s of
            # relay compile (round-3's rc=124 root cause)
            exp = Experiment(
                cfg, seed=0, fast_init=True, init_variables=variables
            )
            state = exp.setup_training(steps_per_epoch=100)
            shared["t_train_setup_s"] = round(_elapsed(), 1)
            accum = max(1, cfg.training.accumulation_steps)
            micro_bs = cfg.batch_size
            T = int(cfg.model_config.get("nb_samp", 64600))
            rng = np.random.RandomState(0)
            xs = jnp.asarray(
                rng.randn(accum, micro_bs, T).astype(np.float32) * 0.1
            )
            ys = jnp.asarray(
                rng.randint(0, 2, (accum, micro_bs)).astype(np.int32)
            )
            ws = jnp.ones((accum,), jnp.float32)
            _log("train: state ready; tracing step (local)")
            lowered_train = exp.train_step.lower(state, xs, ys, ws)
            shared["t_train_trace_s"] = round(_elapsed(), 1)
        except Exception as e:
            shared["train_bench_error"] = type(e).__name__
            _log(f"train: setup FAILED with {type(e).__name__}: {e}")

    # one remote compile in flight at a time: wait out the inference
    # compile, then compile the train step (its executable is NOT run yet —
    # device execution never overlaps an in-flight compile)
    _stage[0] = "waiting for inference compile"
    job_inf.join()
    if job_inf.error is not None:
        shared["infer_bench_error"] = type(job_inf.error).__name__
        _log(f"inference: compile FAILED: {job_inf.error}")
    else:
        shared["t_infer_compile_s"] = round(job_inf.seconds, 1)

    job_train = None
    if lowered_train is not None:
        _stage[0] = "compiling train step"
        _log("train: compiling step (remote)")
        job_train = _CompileJob("train", lowered_train)
        job_train.start()

    def _train_record(ups: float, n: int, provisional=False) -> dict:
        rec = {
            "metric": "train_throughput_utt_per_sec_per_chip",
            "value": round(ups, 2),
            "unit": f"utt/s/chip (Phase-6 FGM step, bs={xs.shape[1]}"
                    f"x{xs.shape[0]} accum, n={n})",
            "vs_baseline": round(ups / REFERENCE_TRAIN_UTT_PER_SEC, 3),
            **shared,
        }
        if provisional:
            rec["provisional"] = True
        return rec

    # --- train: measure (only RPC in flight) ---
    if job_train is not None:
        job_train.join()
        if job_train.error is not None:
            shared["train_bench_error"] = type(job_train.error).__name__
            _log(f"train: compile FAILED: {job_train.error}")
        else:
            shared["t_train_compile_s"] = round(job_train.seconds, 1)
            step = job_train.compiled
            _log(f"train: compiled in {job_train.seconds:.1f}s; "
                 "warming + measuring")
            _stage[0] = "train warm-up (cold execute)"
            try:
                # NO separate warm-up: the FIRST step is itself timed and
                # emitted provisionally the moment it completes (np.asarray
                # is a hard fence; block_until_ready only acks enqueue on
                # the axon relay).  A cold execute can stall for minutes —
                # with a separate warm-up, a slow-but-completing cold
                # execute emitted NOTHING before the deadline (round-5
                # validation); timing it instead gives a pessimistic
                # provisional number (cold-dispatch included, marked in the
                # unit string) that the n-iter record supersedes.
                micro_bs, accum = xs.shape[1], xs.shape[0]
                t0 = time.perf_counter()
                state, metrics = step(state, xs, ys, ws)
                np.asarray(metrics["loss"])
                dt1 = time.perf_counter() - t0
                ups1 = micro_bs * accum / dt1
                shared["train_utt_per_sec_per_chip"] = round(ups1, 2)
                shared["train_vs_baseline"] = round(
                    ups1 / REFERENCE_TRAIN_UTT_PER_SEC, 3
                )
                shared["train_ms_per_step"] = round(dt1 * 1e3, 1)
                rec1 = _train_record(ups1, 1, provisional=True)
                rec1["unit"] += " incl. cold-execute dispatch"
                _emit(rec1)
                _log(f"train: provisional {ups1:.2f} utt/s (1 cold iter)")

                n = 8 if _remaining() > 120 else 3
                t0 = time.perf_counter()
                for _ in range(n):
                    state, metrics = step(state, xs, ys, ws)
                np.asarray(metrics["loss"])  # fence
                dt = (time.perf_counter() - t0) / n
                ups = micro_bs * accum / dt
                shared["train_utt_per_sec_per_chip"] = round(ups, 2)
                shared["train_vs_baseline"] = round(
                    ups / REFERENCE_TRAIN_UTT_PER_SEC, 3
                )
                shared["train_ms_per_step"] = round(dt * 1e3, 1)
                _emit(_train_record(ups, n))
                _stage[0] = "train measured"
                _log(f"train: {dt * 1e3:.1f} ms/step = {ups:.2f} utt/s/chip "
                     f"(n={n}) — record emitted")
            except Exception as e:  # OOM etc. must not lose the round
                shared["train_bench_error"] = type(e).__name__
                _log(f"train: measure FAILED with {type(e).__name__}: {e}")
        # free the train state before the inference bench
        state = xs = ys = ws = None

    # --- inference: measure (executable compiled up front; its first
    # execute is still a cold one, but the train fields are already
    # emitted, so a stall here can only cost the inference record) ---
    if job_inf.error is not None:
        raise job_inf.error
    fwd = job_inf.compiled
    _stage[0] = "inference warm-up (cold execute)"
    _log("inference: warming + measuring")

    def _infer_record(utt_per_sec: float, n: int, provisional=False) -> dict:
        rec = {
            "metric": "inference_throughput_utt_per_sec_per_chip",
            "value": round(utt_per_sec, 2),
            "unit": f"utt/s/chip (bs={batch}, 64600 samples, n={n})",
            "vs_baseline": round(utt_per_sec / REFERENCE_UTT_PER_SEC, 3),
            **shared,
        }
        if provisional:
            rec["provisional"] = True
        return rec

    # first execute is timed and provisional (cold-dispatch included) —
    # same rationale as the train side: a slow-but-completing cold execute
    # should yield a record, not nothing
    t0 = time.perf_counter()
    np.asarray(fwd(variables, x))
    dt1 = time.perf_counter() - t0
    rec1 = _infer_record(batch / dt1, 1, provisional=True)
    rec1["unit"] += " incl. cold-execute dispatch"
    _emit(rec1)
    _log(f"inference: provisional {batch / dt1:.2f} utt/s (1 cold iter)")
    _stage[0] = "inference measuring"

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fwd(variables, x)
    np.asarray(out)  # fence: forces all queued executions to finish
    dt = time.perf_counter() - t0

    utt_per_sec = n_iters * batch / dt
    record = _infer_record(utt_per_sec, n_iters)
    record["t_total_s"] = round(_elapsed(), 1)
    _emit(record)
    _log(f"inference: {utt_per_sec:.2f} utt/s/chip — final record emitted")

    with _lock:
        _done = True
    _log("done")


if __name__ == "__main__":
    main()

"""A/B: serialized-executable reload vs fresh relay compile (train step).

Compile latency is the framework's dominant operational tax (round-4: 331 s
train-step compile in the bench, 2019 s epoch-0 on the LA-size run, and the
jax persistent cache loads big-graph executables as slowly as it compiles
them).  This measures the one remaining lever: AOT executable serialization
(`jax.experimental.serialize_executable`) — pickle the COMPILED train step,
then in a fresh process deserialize_and_load + run, skipping lowering and
(if the relay plugin allows) the server-side compile.

    python benchmarks/aot_compile_ab.py save   # trace+compile+serialize+run
    python benchmarks/aot_compile_ab.py load   # deserialize+run (fresh proc)

The honest comparison for an operator restart is the full wall of each
process: (import + setup + trace + compile + first step) vs (import + setup
+ deserialize + first step).  Artifacts go to /tmp/rade_aot/.
"""

from __future__ import annotations

import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, ".")

AOT_DIR = "/tmp/rade_aot"
T0 = time.monotonic()


def _log(msg):
    print(f"[aot t={time.monotonic() - T0:6.1f}s] {msg}", flush=True)


def _build(micro_bs=16, accum=2, tiny=False):
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from rade_tpu.train.loop import Experiment

    cfg = ge._phase6_cfg(tiny=tiny)
    if tiny:
        micro_bs = 4
    cfg.batch_size = micro_bs
    cfg.training.accumulation_steps = accum
    exp = Experiment(cfg, seed=0, fast_init=True)
    state = exp.setup_training(steps_per_epoch=100)
    T = int(cfg.model_config.get("nb_samp", 64600))
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(accum, micro_bs, T).astype(np.float32) * 0.1)
    ys = jnp.asarray(rng.randint(0, 2, (accum, micro_bs)).astype(np.int32))
    ws = jnp.ones((accum,), jnp.float32)
    _log("experiment + state ready")
    return exp, state, xs, ys, ws


def run_save(tiny=False):
    from jax.experimental import serialize_executable as se

    exp, state, xs, ys, ws = _build(tiny=tiny)
    t0 = time.monotonic()
    lowered = exp.train_step.lower(state, xs, ys, ws)
    _log(f"traced in {time.monotonic() - t0:.1f}s")
    t0 = time.monotonic()
    compiled = lowered.compile()
    t_compile = time.monotonic() - t0
    _log(f"FRESH COMPILE: {t_compile:.1f}s")

    t0 = time.monotonic()
    blob, in_tree, out_tree = se.serialize(compiled)
    t_ser = time.monotonic() - t0
    os.makedirs(AOT_DIR, exist_ok=True)
    with open(f"{AOT_DIR}/train_step.pkl", "wb") as f:
        pickle.dump({"blob": blob, "in_tree": in_tree, "out_tree": out_tree}, f)
    _log(f"serialized {len(blob) / 1e6:.1f} MB in {t_ser:.1f}s "
         f"-> {AOT_DIR}/train_step.pkl")

    t0 = time.monotonic()
    state, metrics = compiled(state, xs, ys, ws)
    np.asarray(metrics["loss"])
    _log(f"first step (fresh-compiled): {time.monotonic() - t0:.1f}s, "
         f"loss={float(np.asarray(metrics['loss'])):.4f}")
    _log(f"TOTAL save-path wall: {time.monotonic() - T0:.1f}s")


def run_load(tiny=False):
    from jax.experimental import serialize_executable as se

    exp, state, xs, ys, ws = _build(tiny=tiny)
    t0 = time.monotonic()
    with open(f"{AOT_DIR}/train_step.pkl", "rb") as f:
        d = pickle.load(f)
    _log(f"blob read in {time.monotonic() - t0:.1f}s")
    t0 = time.monotonic()
    compiled = se.deserialize_and_load(d["blob"], d["in_tree"], d["out_tree"])
    t_deser = time.monotonic() - t0
    _log(f"DESERIALIZE+LOAD: {t_deser:.1f}s")
    t0 = time.monotonic()
    state, metrics = compiled(state, xs, ys, ws)
    np.asarray(metrics["loss"])
    _log(f"first step (deserialized): {time.monotonic() - t0:.1f}s, "
         f"loss={float(np.asarray(metrics['loss'])):.4f}")
    t0 = time.perf_counter()
    for _ in range(3):
        state, metrics = compiled(state, xs, ys, ws)
    np.asarray(metrics["loss"])
    _log(f"steady state: {(time.perf_counter() - t0) / 3 * 1e3:.1f} ms/step")
    _log(f"TOTAL load-path wall: {time.monotonic() - T0:.1f}s")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "save"
    tiny = "tiny" in sys.argv[2:]  # CPU smoke-test mode
    if mode == "save":
        run_save(tiny)
    elif mode == "load":
        run_load(tiny)
    else:
        raise SystemExit(f"unknown mode {mode!r} (save|load)")

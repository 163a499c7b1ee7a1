"""Profile the full Phase-6 train step and print the top device ops.

Runs a few compiled steps under `jax.profiler.trace`, then aggregates the
device trace events by HLO long-name (which carries the jax source line),
printing a ms / % table.  This is the tool behind the BENCH_NOTES cost
breakdowns (SURVEY.md §5 tracing parity — the reference has no profiler).

Usage: python benchmarks/profile_train.py [micro_bs] [accum] [flags]
flags as in bench_train.py (noremat, nosincremat, noaug, nofgm).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

import numpy as np

sys.path.insert(0, ".")

TRACE_DIR = "/tmp/prof_train"


_SRC_RE = None


def _src_key(long_name: str) -> str:
    """Pull `source_file=...:source_line=N` out of the HLO op metadata."""
    global _SRC_RE
    import re

    if _SRC_RE is None:
        _SRC_RE = re.compile(r'source_file="([^"]+)" source_line=(\d+)')
    m = _SRC_RE.search(long_name)
    if not m:
        return ""
    path = m.group(1)
    for root in ("/root/repo/", "site-packages/"):
        if root in path:
            path = path.split(root, 1)[1]
    return f"{path}:{m.group(2)}"


def parse_trace(trace_dir: str, top: int = 30) -> None:
    """Aggregate LEAF device events (wrapper `while`/`call` rows double-count
    their bodies, so they're skipped) by jax source line."""
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace found", flush=True)
        return
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    agg = collections.Counter()
    ops = collections.Counter()
    total = 0.0
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        args = e.get("args", {})
        if not ("long_name" in args or "hlo_category" in args):
            continue
        name = e.get("name", "")
        if name.startswith(("while", "conditional", "call", "jit_", "async")):
            continue  # control-flow wrappers: bodies show up as their own rows
        dur = e.get("dur", 0) / 1e3
        long = args.get("long_name", name)
        src = _src_key(long)
        op = name.split(".")[0]
        agg[src or f"<{op}>"] += dur
        ops[op] += dur
        total += dur
    print(f"total LEAF device time {total:.1f} ms (all profiled steps)")
    print("-- by source line --")
    for name, ms in agg.most_common(top):
        print(f"{ms:9.2f} ms {100 * ms / total:5.1f}%  {name[:150]}")
    print("-- by op kind --")
    for name, ms in ops.most_common(15):
        print(f"{ms:9.2f} ms {100 * ms / total:5.1f}%  {name}")


def main(micro_bs: int = 16, accum: int = 2, flags: str = "") -> None:
    import jax

    import __graft_entry__ as ge
    from rade_tpu.train.loop import Experiment

    cfg = ge._phase6_cfg(tiny=False)
    cfg.batch_size = micro_bs
    cfg.training.accumulation_steps = accum
    if "noremat" in flags:
        cfg.model_config["wavlm_remat"] = False
    if "nosincremat" in flags:
        cfg.model_config["sinc_remat"] = False
    if "noaug" in flags:
        cfg.data.on_device_aug = False
        cfg.data.use_rawboost = False
        cfg.data.use_codec_aug = False
    if "nofgm" in flags:
        cfg.training.use_fgm = False
    print(f"flags={flags!r}", flush=True)
    exp = Experiment(cfg, seed=0, fast_init=True)
    state = exp.setup_training(steps_per_epoch=100)

    import jax.numpy as jnp

    T = int(cfg.model_config.get("nb_samp", 64600))
    rng = np.random.RandomState(0)
    xb = jnp.asarray(rng.randn(accum, micro_bs, T).astype(np.float32) * 0.1)
    yb = jnp.asarray(rng.randint(0, 2, (accum, micro_bs)).astype(np.int32))
    wb = jnp.ones((accum,), jnp.float32)

    state, metrics = exp.train_step(state, xb, yb, wb)
    np.asarray(metrics["loss"])  # compile + fence
    print("compiled", flush=True)

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            state, metrics = exp.train_step(state, xb, yb, wb)
        np.asarray(metrics["loss"])
    print("trace done", flush=True)
    parse_trace(TRACE_DIR)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 16,
        int(sys.argv[2]) if len(sys.argv) > 2 else 2,
        sys.argv[3] if len(sys.argv) > 3 else "",
    )

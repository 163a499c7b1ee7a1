"""Measured per-op HBM traffic of the Phase-6 train step.

Round-4's roofline claim rested on "3.17 TB unfused bytes / a typical XLA
fusion factor of ~6 ~= 530 GB" — an assumed divisor that happened to match
the step time (circular).  This tool replaces the estimate with numbers
read off the OPTIMIZED executable and the device profile:

1. ``compiled.cost_analysis()['bytes accessed']`` — XLA's own post-fusion
   byte count for the executable (each fusion's operands read once +
   outputs written once, the compiler's HBM traffic model of the program
   it actually runs — not the unfused ÷k guess);
2. a per-op table: device-profile leaf events (3 steps under
   ``jax.profiler.trace``) aggregated by HLO instruction, joined with any
   per-event byte/bandwidth counters the xprof plugin exposes; where the
   plugin gives none, the table reports measured ms per op class and the
   implied GB at the 819 GB/s v5e HBM peak as an upper bound;
3. the roofline statement: total post-fusion bytes vs (measured step time
   x 819 GB/s) — if bytes ~= deliverable bytes, the step IS
   bandwidth-bound and the MFU ceiling is measured, not assumed.

Usage: python benchmarks/hbm_bytes.py [micro_bs] [accum] [flags]
(flags as in bench_train.py, e.g. freeze12/freeze18/nofgm)
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

TRACE_DIR = "/tmp/prof_hbm"
V5E_HBM_GBPS = 819.0


def _leaf_events(trace_dir: str):
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return []
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    out = []
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        args = e.get("args", {})
        if not ("long_name" in args or "hlo_category" in args):
            continue
        name = e.get("name", "")
        if name.startswith(("while", "conditional", "call", "jit_", "async")):
            continue
        out.append((name, e.get("dur", 0) / 1e3, args))
    return out


def per_op_table(events, n_steps: int, top: int = 12):
    """Aggregate by HLO instruction; join byte counters when present."""
    ms = collections.Counter()
    byts = collections.Counter()
    byte_keys = set()
    for name, dur, args in events:
        key = name.split(".")[0]  # op class: fusion/convolution/custom-call..
        ms[key] += dur
        for k, v in args.items():
            kl = k.lower().replace(" ", "_")
            if "bytes" in kl and isinstance(v, (int, float, str)):
                try:
                    byts[key] += float(v)
                    byte_keys.add(k)
                except ValueError:
                    pass
    total_ms = sum(ms.values()) / n_steps
    print(f"\n-- per-op-class device time ({n_steps} steps averaged) --")
    print(f"{'op class':28s} {'ms/step':>9s} {'%':>6s} "
          f"{'GB/step' if byts else 'GB@peak(UB)':>12s}")
    for key, m in ms.most_common(top):
        m_step = m / n_steps
        if byts:
            gb = byts[key] / n_steps / 1e9
        else:
            gb = m_step / 1e3 * V5E_HBM_GBPS  # upper bound at peak BW
        print(f"{key:28s} {m_step:9.2f} {100 * m / sum(ms.values()):5.1f}% "
              f"{gb:12.2f}")
    if byte_keys:
        print(f"(per-event byte counters found: {sorted(byte_keys)})")
    else:
        print("(no per-event byte counters in this xprof plugin; GB column "
              "is the at-peak upper bound ms*819GB/s)")
    return total_ms


def main(micro_bs: int = 16, accum: int = 2, flags: str = "") -> None:
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from rade_tpu.train.loop import Experiment

    cfg = ge._phase6_cfg(tiny="tiny" in flags)  # tiny: CPU smoke-test mode
    cfg.batch_size = micro_bs
    cfg.training.accumulation_steps = accum
    if "nofgm" in flags:
        cfg.training.use_fgm = False
    if "freeze12" in flags:
        cfg.model_config["wavlm_freeze_layers"] = 12
    elif "freeze18" in flags:
        cfg.model_config["wavlm_freeze_layers"] = 18
    print(f"flags={flags!r}", flush=True)
    exp = Experiment(cfg, seed=0, fast_init=True)
    state = exp.setup_training(steps_per_epoch=100)

    T = int(cfg.model_config.get("nb_samp", 64600))
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(accum, micro_bs, T).astype(np.float32) * 0.1)
    ys = jnp.asarray(rng.randint(0, 2, (accum, micro_bs)).astype(np.int32))
    ws = jnp.ones((accum,), jnp.float32)

    print("tracing + compiling (one remote compile in flight)...", flush=True)
    t0 = time.monotonic()
    compiled = exp.train_step.lower(state, xs, ys, ws).compile()
    print(f"compiled in {time.monotonic() - t0:.1f}s", flush=True)

    # --- post-fusion cost analysis of the OPTIMIZED executable ---
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, list) else ca
        post_bytes = float(ca.get("bytes accessed", float("nan")))
        flops = float(ca.get("flops", float("nan")))
        print(f"post-fusion bytes accessed: {post_bytes / 1e9:.1f} GB/step")
        print(f"cost-analysis flops:        {flops / 1e12:.2f} TFLOP/step "
              "(scan bodies counted once — see benchmarks/mfu.py)")
    except Exception as e:
        post_bytes = float("nan")
        print(f"cost_analysis unavailable: {type(e).__name__}: {e}")

    # --- measure + profile (device execution only, no compile in flight) ---
    state, metrics = compiled(state, xs, ys, ws)
    np.asarray(metrics["loss"])  # warm fence
    t0 = time.perf_counter()
    for _ in range(4):
        state, metrics = compiled(state, xs, ys, ws)
    np.asarray(metrics["loss"])
    step_ms = (time.perf_counter() - t0) / 4 * 1e3
    ups = micro_bs * accum / (step_ms / 1e3)
    print(f"measured step: {step_ms:.1f} ms = {ups:.2f} utt/s/chip")

    os.makedirs(TRACE_DIR, exist_ok=True)
    n_steps = 3
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(n_steps):
            state, metrics = compiled(state, xs, ys, ws)
        np.asarray(metrics["loss"])
    events = _leaf_events(TRACE_DIR)
    per_op_table(events, n_steps)

    # --- the roofline statement, measured end to end ---
    deliverable = step_ms / 1e3 * V5E_HBM_GBPS
    print("\n-- roofline --")
    print(f"deliverable at 819 GB/s x {step_ms:.1f} ms: {deliverable:.0f} GB")
    if np.isfinite(post_bytes):
        frac = post_bytes / 1e9 / deliverable
        print(f"post-fusion program traffic:           {post_bytes / 1e9:.0f} GB "
              f"({100 * frac:.0f}% of deliverable)")
        print("=> " + (
            "the step is AT its HBM roofline (traffic ~= deliverable)"
            if frac > 0.8 else
            "traffic is below deliverable — the step is NOT purely "
            "bandwidth-bound at this operating point"
        ))


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 16,
        int(sys.argv[2]) if len(sys.argv) > 2 else 2,
        sys.argv[3] if len(sys.argv) > 3 else "",
    )

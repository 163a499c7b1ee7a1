"""CPU-mesh weak-scaling measurement of the jit'd Phase-6 train step.

No multi-chip hardware exists in this environment, so the DP scaling claim
is backed by (a) THIS measurement — the full sharded train step executed on
1/2/4/8 virtual CPU devices at fixed per-device batch, demonstrating the
GSPMD program's per-device work stays constant and quantifying the
collective/partition overhead XLA adds — and (b) the analytic ICI
collective-volume model in docs/BENCH_NOTES.md whose inputs (gradient
bytes, step time) are measured.

On this 1-core box all virtual devices share one core, so wall-clock grows
~linearly with device count; the meaningful statistic is the
WORK-NORMALIZED overhead factor t_N / (N * t_1): 1.0 = the sharded program
adds nothing over N independent copies of the single-device step; >1.0 =
partitioning/collective overhead.

Run: python benchmarks/bench_scaling.py [--devices 1,2,4,8] [--per-device 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

INNER = r"""
import json, os, time
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

import __graft_entry__ as ge
from rade_tpu.parallel.mesh import DATA_AXIS, make_mesh
from rade_tpu.train.loop import Experiment

n = int(os.environ["RADE_SCALE_N"])
per = int(os.environ["RADE_SCALE_PER"])
steps = int(os.environ.get("RADE_SCALE_STEPS", "8"))

cfg = ge._phase6_cfg(tiny=True)
mesh = make_mesh(n, devices=jax.devices("cpu")[:n])
exp = Experiment(cfg, seed=0, mesh=mesh)
state = exp.setup_training(steps_per_epoch=4)

accum = max(1, cfg.training.accumulation_steps)
bs = n * per
T = int(cfg.model_config["nb_samp"])
rng = np.random.RandomState(0)
xs = jax.device_put(rng.randn(accum, bs, T).astype(np.float32) * 0.1,
                    NamedSharding(mesh, P(None, DATA_AXIS)))
ys = jax.device_put(rng.randint(0, 2, (accum, bs)).astype(np.int32),
                    NamedSharding(mesh, P(None, DATA_AXIS)))

# warmup (compile)
state, m = exp.train_step(state, xs, ys)
np.asarray(m["loss"])  # host readback fence

t0 = time.perf_counter()
for _ in range(steps):
    state, m = exp.train_step(state, xs, ys)
loss = float(np.asarray(m["loss"]))
dt = (time.perf_counter() - t0) / steps
print(json.dumps({"n": n, "per_device_batch": per * accum,
                  "step_s": dt, "loss": loss}))
"""


def run_one(n: int, per: int, steps: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["RADE_PLATFORM"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace("--xla_force_host_platform_device_count=8", "")
        + f" --xla_force_host_platform_device_count={n}"
    ).strip()
    env["RADE_SCALE_N"] = str(n)
    env["RADE_SCALE_PER"] = str(per)
    env["RADE_SCALE_STEPS"] = str(steps)
    out = subprocess.run(
        [sys.executable, "-c", INNER], env=env, capture_output=True, text=True
    )
    if out.returncode != 0:
        raise RuntimeError(f"n={n} failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--per-device", type=int, default=2)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()
    ns = [int(x) for x in args.devices.split(",")]
    rows = []
    for n in ns:
        row = run_one(n, args.per_device, args.steps)
        rows.append(row)
        print(json.dumps(row), flush=True)
    t1 = rows[0]["step_s"] / rows[0]["n"]
    print("\nweak scaling (fixed per-device batch, 1 physical core):")
    print(f"{'devices':>8} {'step_s':>9} {'t_N/(N*t_1)':>12}")
    for r in rows:
        factor = r["step_s"] / (r["n"] * t1)
        print(f"{r['n']:>8} {r['step_s']:>9.3f} {factor:>12.3f}")


if __name__ == "__main__":
    main()

"""Microbenchmarks: selective-scan implementations + flagship components.

Run on real TPU:  python benchmarks/bench_kernels.py
Prints per-kernel timings (hard host-readback fences).
"""

from __future__ import annotations

import time

import numpy as np


def timeit(fn, *args, iters=10, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # fence
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from rade_tpu.kernels.selective_scan import (
        selective_scan,
        selective_scan_pallas,
        selective_scan_ref,
    )

    # Phase-6 BiMamba shapes: B=32, L=202 (WavLM frames), d_inner=288, N=16
    bsz, L, D, N = 32, 202, 288, 16
    rng = np.random.RandomState(0)
    u = jnp.asarray(rng.randn(bsz, L, D).astype(np.float32))
    dt = jnp.asarray(np.abs(rng.randn(bsz, L, D)).astype(np.float32) * 0.05)
    A = jnp.asarray(-np.abs(rng.randn(D, N)).astype(np.float32))
    Bm = jnp.asarray(rng.randn(bsz, L, N).astype(np.float32))
    Cm = jnp.asarray(rng.randn(bsz, L, N).astype(np.float32))
    Dp = jnp.asarray(rng.randn(D).astype(np.float32))

    impls = {
        "scan_sequential(ref)": jax.jit(selective_scan_ref),
        "scan_associative": jax.jit(selective_scan),
        "scan_pallas": jax.jit(lambda *a: selective_scan_pallas(*a, 256)),
    }
    results = {}
    for name, fn in impls.items():
        try:
            dt_s = timeit(fn, u, dt, A, Bm, Cm, Dp)
            results[name] = dt_s
            print(f"{name:24s} {dt_s * 1e3:8.3f} ms  ({bsz}x{L}x{D}x{N})")
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:120]}")

    # numerical agreement on device
    y_ref = np.asarray(impls["scan_associative"](u, dt, A, Bm, Cm, Dp))
    for name in ("scan_sequential(ref)", "scan_pallas"):
        if name in results:
            y = np.asarray(impls[name](u, dt, A, Bm, Cm, Dp))
            err = np.max(np.abs(y - y_ref))
            print(f"{name:24s} max |err| vs associative: {err:.2e}")

    # training path: fwd+bwd (associative autodiff vs native Pallas backward)
    w = jnp.asarray(rng.randn(bsz, L, D).astype(np.float32))
    grads = {
        "grad_associative": jax.jit(
            jax.grad(lambda *a: jnp.sum(selective_scan(*a) * w), argnums=(0, 1, 2, 3, 4, 5))
        ),
        "grad_pallas(native)": jax.jit(
            jax.grad(
                lambda *a: jnp.sum(selective_scan_pallas(*a, 256) * w),
                argnums=(0, 1, 2, 3, 4, 5),
            )
        ),
    }
    gref = None
    for name, fn in grads.items():
        try:
            dt_s = timeit(fn, u, dt, A, Bm, Cm, Dp)
            print(f"{name:24s} {dt_s * 1e3:8.3f} ms  (fwd+bwd)")
            g = [np.asarray(x) for x in fn(u, dt, A, Bm, Cm, Dp)]
            if gref is None:
                gref = g
            else:
                err = max(
                    np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9)
                    for a, b in zip(gref, g)
                )
                print(f"{name:24s} grad rel err vs associative: {err:.2e}")
        except Exception as e:
            print(f"{name:24s} FAILED: {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()

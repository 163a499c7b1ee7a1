"""Real-TPU parity + latency for the fused eval attention.

Run:  python benchmarks/check_flash_attention.py
Compares `fused_bias_attention` (Pallas flash kernel, padded 202->256)
against the unfused einsum at the WavLM-Large eval shape (B=32, H=16,
L=202, hd=64) with a gated relative-position bias, in bf16, and times both.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from rade_tpu.kernels.attention import (
    fused_bias_attention,
    reference_bias_attention,
)


def main(B=32, H=16, L=202, hd=64):
    r = np.random.RandomState(0)
    dt = jnp.bfloat16
    q = jnp.asarray(r.randn(B, H, L, hd), dt) * (hd**-0.5)
    k = jnp.asarray(r.randn(B, H, L, hd), dt)
    v = jnp.asarray(r.randn(B, H, L, hd), dt)
    bias = jnp.asarray(r.randn(B, H, L, L) * 0.5, dt)

    fused = jax.jit(fused_bias_attention)
    ref = jax.jit(reference_bias_attention)

    for name, b in (("biased", bias), ("plain", None)):
        got = np.asarray(fused(q, k, v, b), np.float32)
        want = np.asarray(ref(q, k, v, b), np.float32)
        cos = float(
            (got * want).sum()
            / max(np.linalg.norm(got) * np.linalg.norm(want), 1e-9)
        )
        err = float(np.abs(got - want).max())
        print(f"{name}: cos {cos:.6f} maxerr {err:.4f}")
        assert cos > 0.999, (name, cos)

    # per-call dispatch on the axon relay is ~9 ms, so loop inside one jit:
    # chain iterations through v so nothing is DCE'd
    def loop(fn, n):
        @jax.jit
        def run(q, k, v, bias):
            def body(i, vv):
                out = fn(q, k, vv, bias)
                return vv + 1e-6 * out

            return jax.lax.fori_loop(0, n, body, v)

        return run

    n = 100
    for name, fn in (("fused", fused_bias_attention),
                     ("unfused", reference_bias_attention)):
        run = loop(fn, n)
        np.asarray(run(q, k, v, bias))  # compile + fence
        t0 = time.perf_counter()
        out = run(q, k, v, bias)
        np.asarray(out)  # fence (axon acks enqueue only)
        print(f"{name}: {(time.perf_counter()-t0)/n*1e3:.3f} ms/iter (n={n})")


if __name__ == "__main__":
    main()

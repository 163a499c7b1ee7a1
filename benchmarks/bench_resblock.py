"""Real-TPU A/B: XLA SincNetEncoder vs the packed Pallas res-block chain.

Run:  python benchmarks/bench_resblock.py [bs]
Times the full sinc stream (bank + 6 res blocks + readout) both ways at the
flagship shape (70 filters, T=64600), checks parity, prints ms + utt/s.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from rade_tpu.models.dual_stream_se_mamba import SincNetEncoder, sinc_encoder_fast


def fence(x):
    return np.asarray(jax.tree.leaves(x)[0])


def main(bs: int = 32):
    enc = SincNetEncoder(sinc_channels=70)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(bs, 64600).astype(np.float32) * 0.1)
    variables = enc.init(
        {"params": jax.random.PRNGKey(0), "freq_aug": jax.random.PRNGKey(1)},
        x[:2], False, False, False,
    )
    # bf16 everything (the serving dtype)
    bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        variables,
    )
    xb = x.astype(jnp.bfloat16)

    xla_fn = jax.jit(lambda v, x: enc.apply(v, x, False, False, False))
    fast_fn = jax.jit(
        lambda v, x: sinc_encoder_fast(
            v["params"], v["batch_stats"], x, sinc_channels=70
        )
    )

    t0 = time.perf_counter()
    a = xla_fn(bf16, xb)
    fence(a)
    print(f"xla compile+run {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    b = fast_fn(bf16, xb)
    fence(b)
    print(f"pallas compile+run {time.perf_counter()-t0:.1f}s", flush=True)

    af = np.asarray(a, np.float32)
    bf = np.asarray(b, np.float32)
    err = np.max(np.abs(af - bf)) / (np.max(np.abs(af)) + 1e-9)
    print(f"rel maxerr {err:.2e}", flush=True)

    for name, fn in (("xla", xla_fn), ("pallas", fast_fn)):
        fence(fn(bf16, xb))
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(bf16, xb)
        fence(out)
        dt = (time.perf_counter() - t0) / n
        print(f"{name}: {dt*1e3:.2f} ms ({bs/dt:.1f} utt/s)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 32)

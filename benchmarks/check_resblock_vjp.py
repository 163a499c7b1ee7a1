"""Real-TPU gradient parity + timing for the native Pallas res-block backward.

Compares `chain_packed_native` (all-Pallas VJP, kernels/resblock_packed_vjp
.py) against the f32 jnp reference chain AND against the shipped
XLA-recompute VJP (`chain_packed_trainable`) as a control, at the flagship
6-block Phase-6 shapes (B=2, H=23, W=21491; models/AASIST.py:413-466).

Two losses:
  - linear (sum(out * ct)/N): grad magnitude independent of forward values —
    isolates routing/truncation noise.  The right correctness yardstick on
    hardware, where MXU DEFAULT precision perturbs maxpool tie routing and
    any nonlinear loss amplifies forward noise exponentially (tanh' ~
    e^{-2|y|}: a delta shift in y rescales grads by e^{2 delta}).
  - tanh (sum(tanh(out))): reported for completeness; expect large relnorms
    at depth 6 for BOTH the native and the recompute backward.

Run: python benchmarks/check_resblock_vjp.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _params(rng, cin, cout, jnp):
    p = {
        "w1": rng.randn(2, 3, cin, cout).astype(np.float32) * 0.2,
        "b1": rng.randn(cout).astype(np.float32) * 0.1,
        "bn_scale": 1.0 + 0.1 * rng.randn(cout).astype(np.float32),
        "bn_bias": 0.1 * rng.randn(cout).astype(np.float32),
        "bn_mean": 0.1 * rng.randn(cout).astype(np.float32),
        "bn_var": (1.0 + 0.2 * rng.rand(cout)).astype(np.float32),
        "w2": rng.randn(2, 3, cout, cout).astype(np.float32) * 0.2,
        "b2": rng.randn(cout).astype(np.float32) * 0.1,
    }
    if cin != cout:
        p["wd"] = rng.randn(1, 3, cin, cout).astype(np.float32) * 0.2
        p["bd"] = rng.randn(cout).astype(np.float32) * 0.1
    return {k: jnp.asarray(v) for k, v in p.items()}


def _report(fa, ra):
    fa = np.asarray(fa, np.float32).ravel()
    ra = np.asarray(ra, np.float32).ravel()
    cos = float(fa @ ra / (np.linalg.norm(fa) * np.linalg.norm(ra) + 1e-30))
    rn = float(np.linalg.norm(fa - ra) / (np.linalg.norm(ra) + 1e-30))
    return cos, rn


def main():
    import jax
    import jax.numpy as jnp

    from rade_tpu.kernels.resblock_grad import chain_packed_trainable, chain_ref
    from rade_tpu.kernels.resblock_packed_vjp import chain_packed_native

    rng = np.random.RandomState(0)
    B, H, W = 2, 23, 21491
    specs = [(1, 32), (32, 32), (32, 64), (64, 64), (64, 64), (64, 64)]
    x = jnp.asarray(
        rng.randn(B, H, W, 1).astype(np.float32) * 0.05
        + 1.0 * (np.arange(W) % 3 == 1)[None, None, :, None]
    )
    blocks = [_params(rng, ci, co, jnp) for ci, co in specs]
    w_out = W // 3 ** 6
    ct = jnp.asarray(rng.randn(B, H, w_out, 64).astype(np.float32))

    def make(chain, kind):
        if kind == "linear":
            def loss(b, x):
                out = chain(b, x).astype(jnp.float32)
                return jnp.sum(out * ct) / (B * H * w_out)
        else:
            def loss(b, x):
                return jnp.sum(jnp.tanh(chain(b, x).astype(jnp.float32)))
        return jax.jit(lambda b, x: jax.value_and_grad(loss, argnums=(0, 1))(b, x))

    for kind in ("linear", "tanh"):
        f_ref = make(chain_ref, kind)
        vr, (dbr, dxr) = jax.block_until_ready(f_ref(blocks, x))
        for name, chain in (
            ("native", chain_packed_native),
            ("recompute", lambda b, x: chain_packed_trainable(b, x)),
        ):
            f = make(chain, kind)
            vf, (dbf, dxf) = jax.block_until_ready(f(blocks, x))
            c, rn = _report(dxf, dxr)
            worst = (1.0, 0.0, "")
            for i, (bf, br) in enumerate(zip(dbf, dbr)):
                for k in sorted(br):
                    c2, rn2 = _report(bf[k], br[k])
                    if rn2 > worst[1]:
                        worst = (c2, rn2, f"b{i}.{k}")
            t0 = time.perf_counter()
            for _ in range(5):
                out = f(blocks, x)
            jax.block_until_ready(out)
            dt = (time.perf_counter() - t0) / 5
            print(
                f"{kind:6s} {name:9s}: dx cos={c:.5f} rn={rn:.2e} | "
                f"worst {worst[2]}: cos={worst[0]:.5f} rn={worst[1]:.2e} | "
                f"fwd+bwd {dt*1e3:.1f} ms"
            )


if __name__ == "__main__":
    main()

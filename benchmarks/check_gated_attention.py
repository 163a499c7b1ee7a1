"""Real-TPU validation + micro-bench of kernels/gated_attention.py.

The CPU suite (tests/test_gated_attention.py) proves kernel-body math via
injected masks in interpret mode; this script covers what only real
hardware can:

1. PRNG path: keep-rate ~ 1-p, mask determinism across calls, per-(b,h)
   stream independence (dump_keep_mask);
2. fwd + all five cotangents of the PRNG kernels vs the unfused reference
   fed the DUMPED mask — proves fwd and bwd regenerate the identical mask
   on hardware;
3. micro-bench at the flagship shape (B=16/32, H=16, L=202, hd=64):
   fused kernel vs unfused einsum, fwd and fwd+bwd, bf16.

Run: python benchmarks/check_gated_attention.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def _fence(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0])


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    from rade_tpu.kernels import gated_attention as ga

    B, H, L, hd = 4, 16, 202, 64
    p = 0.1  # WavLM-Large attention_dropout
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, H, L, hd).astype(np.float32) * 0.3)
    k = jnp.asarray(rng.randn(B, H, L, hd).astype(np.float32) * 0.3)
    v = jnp.asarray(rng.randn(B, H, L, hd).astype(np.float32) * 0.5)
    gate = jnp.asarray(rng.uniform(1.0, 4.0, (B, H, L, 1)).astype(np.float32))
    bias = jnp.asarray(rng.randn(H, L, L).astype(np.float32) * 0.5)

    # ---- 1. PRNG statistics + determinism ----
    m1 = np.asarray(ga.dump_keep_mask(B, H, L, 42, p))
    m2 = np.asarray(ga.dump_keep_mask(B, H, L, 42, p))
    m3 = np.asarray(ga.dump_keep_mask(B, H, L, 43, p))
    assert np.array_equal(m1, m2), "mask not deterministic for fixed seed"
    assert not np.array_equal(m1, m3), "mask ignores the seed"
    assert not np.array_equal(m1[0, 0], m1[0, 1]), "streams not per-(b,h)"
    rate = m1.mean()
    print(f"keep rate {rate:.4f} (want {1-p:.2f})")
    assert abs(rate - (1 - p)) < 0.01, rate

    # ---- 2. PRNG fwd/bwd vs reference with the dumped mask ----
    seed = 1234
    mask = ga.dump_keep_mask(B, H, L, seed, p)
    probe = jnp.asarray(rng.randn(B, H, L, hd).astype(np.float32))

    def loss_k(q, k, v, gate, bias):
        return jnp.sum(
            ga.gated_attention(q, k, v, gate, bias, seed=seed, dropout_p=p,
                               train=True) * probe
        )

    def loss_r(q, k, v, gate, bias):
        return jnp.sum(
            ga.reference_gated_attention(q, k, v, gate, bias, dropout_p=p,
                                         keep_mask=mask) * probe
        )

    out_k = ga.gated_attention(q, k, v, gate, bias, seed=seed, dropout_p=p,
                               train=True)
    out_r = ga.reference_gated_attention(q, k, v, gate, bias, dropout_p=p,
                                         keep_mask=mask)
    err = float(jnp.max(jnp.abs(out_k - out_r)))
    print(f"fwd max|err| vs dumped-mask reference: {err:.2e}")
    assert err < 3e-5, err

    gk = jax.jit(jax.grad(loss_k, argnums=(0, 1, 2, 3, 4)))(q, k, v, gate, bias)
    gr = jax.jit(jax.grad(loss_r, argnums=(0, 1, 2, 3, 4)))(q, k, v, gate, bias)
    for a, b, name in zip(gk, gr, ["dq", "dk", "dv", "dgate", "dbias"]):
        e = float(jnp.max(jnp.abs(a - b)))
        print(f"{name}: max|err| {e:.2e}")
        assert e < 5e-4, (name, e)
    print("PRNG fwd/bwd parity OK (backward regenerates the forward's mask)")

    # ---- 3. micro-bench at flagship shapes, bf16 ----
    for Bb in (16, 32):
        qb = jnp.asarray(
            rng.randn(Bb, H, L, hd).astype(np.float32) * 0.3, jnp.bfloat16
        )
        kb = jnp.asarray(
            rng.randn(Bb, H, L, hd).astype(np.float32) * 0.3, jnp.bfloat16
        )
        vb = jnp.asarray(
            rng.randn(Bb, H, L, hd).astype(np.float32) * 0.5, jnp.bfloat16
        )
        gb = jnp.asarray(
            rng.uniform(1, 4, (Bb, H, L, 1)).astype(np.float32), jnp.bfloat16
        )
        bb = bias.astype(jnp.bfloat16)

        def fused_f(q, k, v, gate, bias):
            return ga.gated_attention(q, k, v, gate, bias, seed=7,
                                      dropout_p=p, train=True)

        def ref_f(q, k, v, gate, bias):
            key = jax.random.PRNGKey(7)
            return ga.reference_gated_attention(q, k, v, gate, bias, key=key,
                                                dropout_p=p)

        for name, f in [("fused", fused_f), ("unfused", ref_f)]:
            # forward-only
            jf = jax.jit(f)
            np.asarray(jf(qb, kb, vb, gb, bb))
            t0 = time.perf_counter()
            for _ in range(20):
                o = jf(qb, kb, vb, gb, bb)
            np.asarray(o)
            fwd_ms = (time.perf_counter() - t0) / 20 * 1e3

            def lossf(*a):
                return jnp.sum(f(*a).astype(jnp.float32) * 1e-3)

            jg = jax.jit(jax.grad(lossf, argnums=(0, 1, 2, 3, 4)))
            _fence(jg(qb, kb, vb, gb, bb))
            t0 = time.perf_counter()
            for _ in range(20):
                g = jg(qb, kb, vb, gb, bb)
            _fence(g)
            fb_ms = (time.perf_counter() - t0) / 20 * 1e3
            print(
                f"B={Bb}: {name:8s} fwd {fwd_ms:7.2f} ms   fwd+bwd "
                f"{fb_ms:7.2f} ms  (x24 layers: {24*fb_ms:6.1f} ms)",
                flush=True,
            )


if __name__ == "__main__":
    main()

"""Ground-truth check: xla-bf16 and pallas-bf16 sinc streams vs f32 XLA.

Both bf16 paths accumulate rounding differently through the 6-block chain;
what matters is that the Pallas path is no farther from the f32 truth than
the XLA bf16 path the benchmarks already ship.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from rade_tpu.models.dual_stream_se_mamba import SincNetEncoder, sinc_encoder_fast


def main(bs: int = 8):
    enc = SincNetEncoder(sinc_channels=70)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(bs, 64600).astype(np.float32) * 0.1)
    variables = enc.init(
        {"params": jax.random.PRNGKey(0), "freq_aug": jax.random.PRNGKey(1)},
        x[:2], False, False, False,
    )
    bf16 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if jnp.issubdtype(a.dtype, jnp.floating) else a,
        variables,
    )
    xb = x.astype(jnp.bfloat16)

    ref32 = np.asarray(
        jax.jit(lambda v, x: enc.apply(v, x, False, False, False))(variables, x),
        np.float32,
    )
    xla16 = np.asarray(
        jax.jit(lambda v, x: enc.apply(v, x, False, False, False))(bf16, xb),
        np.float32,
    )
    pal16 = np.asarray(
        jax.jit(
            lambda v, x: sinc_encoder_fast(
                v["params"], v["batch_stats"], x, sinc_channels=70
            )
        )(bf16, xb),
        np.float32,
    )
    scale = np.max(np.abs(ref32))

    def stats(name, a):
        err = np.abs(a - ref32)
        cos = np.sum(a * ref32) / (
            np.linalg.norm(a) * np.linalg.norm(ref32) + 1e-12
        )
        print(
            f"{name}: rel-max {err.max()/scale:.3e} rel-mean {err.mean()/scale:.3e} "
            f"cos {cos:.6f}",
            flush=True,
        )

    stats("xla-bf16  vs f32", xla16)
    stats("pallas-bf16 vs f32", pal16)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)

"""Real-TPU flagship inference A/B over model_config flag overrides.

Run:  python benchmarks/bench_infer_ab.py key=val [key=val ...]
Loads the shipped Phase6_TPU.conf, applies the given model_config overrides
(vals parsed as JSON, so `wavlm_flash_attention=true`), and times the bf16
scoring step at bs=32 exactly like bench.py.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(overrides):
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as ge
    from rade_tpu.registry import build_model
    from rade_tpu.train.step import cast_tree

    cfg = ge._phase6_cfg(tiny=False)
    for k, v in overrides.items():
        cfg.model_config[k] = v
    print(f"overrides={overrides}", flush=True)

    model = build_model(dict(cfg.model_config))
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((32, int(cfg.model_config["nb_samp"])), jnp.float32)
    variables = model.init(
        {"params": rng, "dropout": rng, "freq_aug": rng}, x[:2], train=False
    )
    use_fast_sinc = bool(cfg.model_config.get("use_pallas_resblock"))
    sinc_channels = int(cfg.model_config.get("sinc_channels", 70))

    @jax.jit
    def fwd(variables, x):
        bf16_vars = {k: cast_tree(v, jnp.bfloat16) for k, v in variables.items()}
        xb = x.astype(jnp.bfloat16)
        if use_fast_sinc:
            from rade_tpu.models.dual_stream_se_mamba import sinc_encoder_fast

            sf = sinc_encoder_fast(
                bf16_vars["params"]["sinc_stream"],
                bf16_vars["batch_stats"]["sinc_stream"],
                xb, sinc_channels=sinc_channels,
            )
            _, logits = model.apply(bf16_vars, xb, train=False, sinc_features=sf)
        else:
            _, logits = model.apply(bf16_vars, xb, train=False)
        return logits.astype(jnp.float32)

    t0 = time.perf_counter()
    np.asarray(fwd(variables, x))
    print(f"compile {time.perf_counter()-t0:.1f}s", flush=True)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = fwd(variables, x)
    np.asarray(out)  # fence
    dt = time.perf_counter() - t0
    ups = n * 32 / dt
    print(
        json.dumps({"utt_per_sec_per_chip": round(ups, 2),
                    "vs_baseline": round(ups / 25.0, 3)}),
        flush=True,
    )


if __name__ == "__main__":
    ov = {}
    for arg in sys.argv[1:]:
        k, v = arg.split("=", 1)
        try:
            ov[k] = json.loads(v)
        except json.JSONDecodeError:
            ov[k] = v
    main(ov)

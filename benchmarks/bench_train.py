"""Real-TPU Phase-6 training-step throughput (full recipe, single chip).

Run:  python benchmarks/bench_train.py [micro_bs] [accum]
Builds the shipped Phase6_TPU.conf experiment (bf16, LoRA, FGM, mixup,
focal, EMA, on-device aug, scan-layers WavLM) with synthetic data and times
the jit'd train step.  Reference baseline: 14-28 utt/s on an RTX 4090D
(BASELINE.md, 15-30 min/epoch over 25,380 utts, FGM on).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main(micro_bs: int = 16, accum: int = 2, flags: str = ""):
    import jax
    import jax.numpy as jnp

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
    if "noshare" in flags:
        cfg.training.fgm_share_frontend = False
    if "noscantrain" in flags:
        cfg.model_config["use_pallas_scan_training"] = False
    if "nofastrng" in flags:
        cfg.training.fast_rng = False
    if "rematdots" in flags:
        cfg.model_config["wavlm_remat_policy"] = "dots"
    elif "rematdnb" in flags:
        cfg.model_config["wavlm_remat_policy"] = "dots_no_batch"
    if "nativesinc" in flags:
        cfg.model_config["use_pallas_resblock_training"] = "native"
    elif "fastsinc" in flags:
        cfg.model_config["use_pallas_resblock_training"] = True
    if "gatedattn" in flags:
        cfg.model_config["wavlm_fused_gated_attention"] = True
    if "freeze12" in flags:
        # bottom-12 WavLM layers frozen: the reference's Phase-5/6 fast
        # recipe (`/root/reference/src/models/DualStreamSEMamba.py:338-370`)
        cfg.model_config["wavlm_freeze_layers"] = 12
    elif "freeze18" in flags:
        # bottom-18 frozen: the reference's Phase-4 recipe
        cfg.model_config["wavlm_freeze_layers"] = 18
    print(f"flags={flags!r}", flush=True)
    exp = Experiment(cfg, seed=0, fast_init=True)
    state = exp.setup_training(steps_per_epoch=100)

    T = int(cfg.model_config.get("nb_samp", 64600))
    rng = np.random.RandomState(0)
    xs = jnp.asarray(rng.randn(accum, micro_bs, T).astype(np.float32) * 0.1)
    ys = jnp.asarray(rng.randint(0, 2, (accum, micro_bs)).astype(np.int32))
    ws = jnp.ones((accum,), jnp.float32)

    t0 = time.perf_counter()
    state, metrics = exp.train_step(state, xs, ys, ws)
    print(
        f"compile+run {time.perf_counter()-t0:.1f}s loss={float(metrics['loss']):.4f}",
        flush=True,
    )

    n = 8
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = exp.train_step(state, xs, ys, ws)
    np.asarray(metrics["loss"])  # fence
    dt = (time.perf_counter() - t0) / n
    utts = micro_bs * accum
    print(
        f"train step: {dt*1e3:.1f} ms for {utts} utts -> {utts/dt:.2f} utt/s/chip "
        f"(bs={micro_bs} accum={accum}, FGM={cfg.training.use_fgm})",
        flush=True,
    )


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 16,
        int(sys.argv[2]) if len(sys.argv) > 2 else 2,
        sys.argv[3] if len(sys.argv) > 3 else "",
    )

"""Flagship score-ordering parity: XLA vs Pallas-res-block scoring paths.

EER depends only on score ORDER.  Scores a batch of random utterances with
the full flagship three ways —

  f32      : XLA path, mixed_precision off (the numeric truth)
  xla-bf16 : XLA path, bf16 (the round-1 default scoring path)
  pallas   : bf16 + the packed fused res-block chain (use_pallas_resblock)

— and reports, for each bf16 path, the max score delta and rank mismatches
vs the f32 truth, plus pallas-vs-xla directly.  At RANDOM INIT the scores
cluster within ~1 bf16 ulp of each other, so rank swaps measure bf16
rounding noise, not kernel error; what matters is that the pallas path is
no farther from the f32 truth than the plain-XLA bf16 path.  Run on the
real TPU.
"""

import dataclasses
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import __graft_entry__ as ge
from rade_tpu.registry import build_model
from rade_tpu.train.step import make_eval_step


def rank_stats(name, s, truth):
    r_s = np.argsort(np.argsort(s))
    r_t = np.argsort(np.argsort(truth))
    n = int(np.sum(r_s != r_t))
    # Spearman rho between the two orderings
    rho = np.corrcoef(r_s, r_t)[0, 1]
    print(
        f"{name:14s} max|ds|={np.max(np.abs(s - truth)):.4e} "
        f"rank-mismatch {n}/{len(s)}  spearman {rho:.4f}",
        flush=True,
    )


def main(bs: int = 16):
    cfg = ge._phase6_cfg(tiny=False)
    model = build_model(dict(cfg.model_config))
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (bs, 64600), jnp.float32) * 0.1
    variables = model.init(
        {"params": rng, "dropout": rng, "freq_aug": rng}, x[:2], train=False
    )
    params = {"model": variables["params"], "loss": {}}
    stats = variables.get("batch_stats", {})

    def score(mc_overrides, bf16):
        c = dataclasses.replace(cfg)
        c.model_config = {**cfg.model_config, **mc_overrides}
        c.training = dataclasses.replace(cfg.training, mixed_precision=bf16)
        return np.asarray(
            jax.jit(make_eval_step(model, c))(params, stats, x), np.float32
        )

    s_f32 = score({"use_pallas_resblock": False, "use_pallas_scan": False}, False)
    print("f32 truth done", flush=True)
    s_xla = score({"use_pallas_resblock": False}, True)
    print("xla-bf16 done", flush=True)
    s_pal = score({}, True)
    print("pallas-bf16 done", flush=True)

    print(f"score std (f32 truth) {np.std(s_f32):.4e}")
    rank_stats("xla-bf16", s_xla, s_f32)
    rank_stats("pallas-bf16", s_pal, s_f32)
    rank_stats("pallas-vs-xla", s_pal, s_xla)
    print("f32  ", np.round(s_f32, 4).tolist(), flush=True)
    print("xla  ", np.round(s_xla, 4).tolist(), flush=True)
    print("palls", np.round(s_pal, 4).tolist(), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)

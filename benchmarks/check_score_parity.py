"""Flagship score-ordering parity: XLA vs Pallas-res-block scoring paths.

EER depends only on score ORDER.  Scores a batch of random utterances with
the full flagship (bf16) with and without use_pallas_resblock and reports
the rank correlation + max score delta.  Run on the real TPU.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

import __graft_entry__ as ge
from rade_tpu.registry import build_model
from rade_tpu.train.step import cast_tree, make_eval_step


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

    import dataclasses

    cfg_xla = dataclasses.replace(cfg)
    cfg_xla.model_config = {**cfg.model_config, "use_pallas_resblock": False}
    s_xla = np.asarray(
        jax.jit(make_eval_step(model, cfg_xla))(params, stats, x), np.float32
    )
    print("xla scores done", flush=True)
    s_pal = np.asarray(
        jax.jit(make_eval_step(model, cfg))(params, stats, x), np.float32
    )
    print("pallas scores done", flush=True)

    order_x = np.argsort(np.argsort(s_xla))
    order_p = np.argsort(np.argsort(s_pal))
    n_swaps = int(np.sum(order_x != order_p))
    denom = np.std(s_xla) + 1e-9
    print(
        f"max |dscore| {np.max(np.abs(s_xla - s_pal)):.4e} "
        f"(score std {denom:.4e}); rank mismatches {n_swaps}/{bs}",
        flush=True,
    )
    print("xla  ", np.round(s_xla, 4).tolist(), flush=True)
    print("palls", np.round(s_pal, 4).tolist(), flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 16)

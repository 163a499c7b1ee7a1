"""Model smoke-check CLI: instantiate -> forward -> loss -> gradient census.

Equivalent of the reference's sanity scripts (`utils/check_model.py`,
`legacy_archives/phase3_moe/check_moe_model.py`): builds a model from a
config, runs a dummy forward with shape asserts, computes a loss and its
gradients, and reports frozen/trainable parameter counts.  Where the
reference mocks `mamba_ssm` to run on CPU (`check_model.py:6-24`), here the
jnp associative-scan path IS the CPU-runnable backend, so the real compute
graph is checked.

Usage: python -m rade_tpu.tools.check_model --config C [--nb_samp 6000]
"""

from __future__ import annotations

import argparse

import numpy as np


def check(model_config: dict, training_config: dict | None = None, nb_samp=6000, batch=2):
    import jax
    import jax.numpy as jnp

    from rade_tpu.losses import weighted_cross_entropy
    from rade_tpu.registry import build_model

    model = build_model(dict(model_config))
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (batch, nb_samp)) * 0.1
    variables = model.init(
        {"params": rng, "dropout": rng, "freq_aug": rng}, x, train=False
    )
    params = variables["params"]
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"[check] instantiated {model_config['architecture']}: {n_params:,} params")

    feats, logits = model.apply(variables, x, train=False)
    assert logits.shape == (batch, 2), f"bad logits shape {logits.shape}"
    assert np.all(np.isfinite(np.asarray(logits))), "non-finite logits"
    print(f"[check] forward ok: feats {feats.shape}, logits {logits.shape}")

    y = jnp.asarray([0, 1][:batch])

    def loss_fn(p):
        out = model.apply(
            {"params": p, **{k: v for k, v in variables.items() if k != "params"}},
            x, train=True, rngs={"dropout": rng, "freq_aug": rng},
            mutable=["batch_stats"],
        )
        (f, lg), _ = out
        return weighted_cross_entropy(lg, y)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    n_zero = sum(
        int(np.all(np.asarray(g) == 0)) for g in jax.tree.leaves(grads)
    )
    n_leaves = len(jax.tree.leaves(grads))
    print(f"[check] loss {float(loss):.4f}; grads: {n_leaves - n_zero}/{n_leaves} leaves nonzero")
    assert np.isfinite(float(loss))
    return n_params, float(loss)


def main():
    from rade_tpu.config import load_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--nb_samp", type=int, default=6000)
    args = ap.parse_args()
    cfg = load_config(args.config)
    mc = dict(cfg.model_config)
    mc["nb_samp"] = args.nb_samp
    check(mc, nb_samp=args.nb_samp)
    print("[check] all good")


if __name__ == "__main__":
    main()

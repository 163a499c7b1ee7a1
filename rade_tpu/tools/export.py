"""Export a trained scorer to a portable StableHLO artifact (`jax.export`).

A deployment path the reference lacks entirely (its serving story is
`python main.py --eval` inside the research repo, `/root/reference/src/main.py:331-404`):
here the jit'd scoring function — model forward + score head (logits[:, 1] or
the OC-Softmax center cosine) — is serialized once and can be loaded and
executed by any JAX runtime with no model code, on the platforms it was
lowered for (TPU serving + CPU fallback by default).

Weights stay ARGUMENTS of the exported function (not baked constants), so the
artifact is small and weights keep coming from the framework's checkpoints.

CLI:
    python -m rade_tpu.tools.export --config configs/Phase6_Proposed.conf \
        --weights best.ckpt --out scorer.shlo [--batch 32] [--platforms tpu,cpu]

Serving side:
    from rade_tpu.tools.export import load_scorer
    scorer = load_scorer("scorer.shlo")
    scores = scorer.call(params, batch_stats, waveforms)   # jit-able
"""

from __future__ import annotations

import argparse
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport


def build_scorer(cfg):
    """(eval_step, nb_samp) for a config — mirrors Experiment's eval path."""
    from rade_tpu.registry import build_model
    from rade_tpu.train.step import make_eval_step

    model_config = dict(cfg.model_config)
    if cfg.training.use_lora and "lora_r" not in model_config:
        model_config["lora_r"] = cfg.training.lora_r
        model_config["lora_alpha"] = cfg.training.lora_alpha
    model = build_model(model_config)
    return make_eval_step(model, cfg), int(cfg.model_config.get("nb_samp", 64600))


def export_scorer(
    cfg,
    params,
    batch_stats,
    batch_size: int = 0,
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> jexport.Exported:
    """Serialize the scoring function.  batch_size=0 -> symbolic batch dim."""
    eval_step, nb_samp = build_scorer(cfg)

    p_spec = jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), params)
    s_spec = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), batch_stats
    )
    if batch_size:
        x_spec = jax.ShapeDtypeStruct((batch_size, nb_samp), jnp.float32)
    else:
        (b,) = jexport.symbolic_shape("b")
        x_spec = jax.ShapeDtypeStruct((b, nb_samp), jnp.float32)

    return jexport.export(jax.jit(eval_step), platforms=list(platforms))(
        p_spec, s_spec, x_spec
    )


def load_scorer(path: str) -> jexport.Exported:
    with open(path, "rb") as f:
        return jexport.deserialize(bytearray(f.read()))


def main(argv: Optional[Sequence[str]] = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--weights", required=True, help="framework .ckpt")
    ap.add_argument("--out", required=True, help="output artifact path")
    ap.add_argument(
        "--batch", type=int, default=0,
        help="batch size to specialize for (0 = symbolic batch dim)",
    )
    ap.add_argument("--platforms", default="tpu,cpu")
    args = ap.parse_args(argv)

    from rade_tpu.config import load_config
    from rade_tpu.train.checkpoint import load_eval_weights
    from rade_tpu.train.loop import Experiment

    cfg = load_config(args.config)
    exp = Experiment(cfg, seed=0)
    params, batch_stats = load_eval_weights(
        args.weights,
        {"model": exp.params["model"], "loss": exp.params["loss"]},
        exp.batch_stats,
    )

    exported = export_scorer(
        cfg, params, batch_stats, args.batch, tuple(args.platforms.split(","))
    )
    data = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(data)
    print(
        f"wrote {args.out}: {len(data) / 1e6:.2f} MB, platforms="
        f"{exported.platforms}, in_avals={[str(a) for a in exported.in_avals[-1:]]}"
    )


if __name__ == "__main__":
    main()

"""Optimizer + LR schedule: AdamW param groups, linear warmup -> cosine.

Mirrors the reference trainer's inline optimizer
(`/root/reference/src/main.py:405-483`):

- AdamW with differential learning rates — params under ``wavlm_stream`` get
  ``wavlm_lr``, everything else (backbone + loss params) gets ``base_lr``;
- LinearLR(start_factor=warmup_init_factor) for ``warmup_steps`` then
  CosineAnnealingLR to ``eta_min`` (absolute floor, shared by all groups);
- schedules advance per *optimizer* step (gradient accumulation happens
  inside the train step, so every `tx.update` is one optimizer step);
- global-norm gradient clipping at 3.0 happens before the update.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rade_tpu.config import OptimConfig, TrainingConfig


def warmup_cosine_schedule(
    base_lr: float,
    total_steps: int,
    warmup_steps: int,
    warmup_init_factor: float = 0.1,
    eta_min: float = 0.0,
) -> optax.Schedule:
    """torch LinearLR->CosineAnnealingLR (SequentialLR) semantics."""
    warmup_steps = min(max(1, warmup_steps), max(1, total_steps - 1))
    t_max = max(1, total_steps - warmup_steps)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm_frac = jnp.clip(step / warmup_steps, 0.0, 1.0)
        warm_lr = base_lr * (warmup_init_factor + (1.0 - warmup_init_factor) * warm_frac)
        t = jnp.clip(step - warmup_steps, 0.0, t_max)
        cos_lr = eta_min + (base_lr - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * t / t_max))
        return jnp.where(step < warmup_steps, warm_lr, cos_lr)

    return schedule


def wavlm_label_fn(params: Dict[str, Any]) -> Dict[str, Any]:
    """Label each param 'wavlm' if its path contains wavlm_stream, else 'backbone'."""

    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label_of_path(path) -> str:
        keys = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        return "wavlm" if any("wavlm_stream" in str(k) for k in keys) else "backbone"

    labels = jax.tree_util.tree_map_with_path(lambda p, _: label_of_path(p), params)
    return labels


def make_lr_schedule(
    optim_cfg: OptimConfig,
    training_cfg: TrainingConfig,
    total_optimizer_steps: int,
    base_lr: Optional[float] = None,
) -> optax.Schedule:
    """The warmup+cosine schedule one optimizer group runs on (shared by
    `make_optimizer` and the scalar logger, so logged LR == applied LR)."""
    eta_min = float(
        optim_cfg.scheduler_config.get("eta_min", optim_cfg.lr_min)
    )
    warmup_steps = int(
        training_cfg.warmup_ratio * total_optimizer_steps
    ) if training_cfg.warmup_ratio > 0 else 1
    warmup_steps = max(1, warmup_steps)
    return warmup_cosine_schedule(
        optim_cfg.base_lr if base_lr is None else base_lr,
        total_optimizer_steps,
        warmup_steps,
        training_cfg.warmup_init_factor,
        eta_min,
    )


def make_optimizer(
    optim_cfg: OptimConfig,
    training_cfg: TrainingConfig,
    total_optimizer_steps: int,
    grad_clip_norm: float = 3.0,
    trainable_mask=None,
) -> optax.GradientTransformation:
    """AdamW with differential LR groups and warmup+cosine schedules.

    `trainable_mask` (1/0 pytree) wraps the update in `optax.masked` so
    frozen params (e.g. the 315M-param WavLM base under LoRA) carry NO adam
    moments — that's 2x the base model in HBM saved versus allocating state
    for parameters that never move.
    """

    def group(base_lr: float) -> optax.GradientTransformation:
        sched = make_lr_schedule(
            optim_cfg, training_cfg, total_optimizer_steps, base_lr
        )
        return optax.adamw(
            learning_rate=sched,
            b1=optim_cfg.betas[0],
            b2=optim_cfg.betas[1],
            weight_decay=optim_cfg.weight_decay,
        )

    wavlm_lr = optim_cfg.wavlm_lr if optim_cfg.wavlm_lr is not None else 1e-6
    tx = optax.multi_transform(
        {"backbone": group(optim_cfg.base_lr), "wavlm": group(wavlm_lr)},
        wavlm_label_fn,
    )
    if trainable_mask is not None:
        # per-layer VECTOR leaves (stacked layouts with bottom-N freezing)
        # keep their adam state: any trainable lane needs moments, and the
        # frozen lanes' grads are exactly zero so their moments stay zero
        bool_mask = jax.tree.map(
            lambda m: bool(np.any(np.asarray(m) > 0)), trainable_mask
        )
        tx = optax.masked(tx, bool_mask)
    return optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)


def legacy_schedule(optim_cfg: OptimConfig) -> optax.Schedule:
    """The reference's `create_optimizer` scheduler family
    (`/root/reference/src/utils.py:40-133`): multistep / sgdr (warm restarts) /
    cosine (LambdaLR form) / keras_decay, for legacy baseline configs."""
    name = optim_cfg.scheduler
    base_lr = optim_cfg.base_lr
    sc = optim_cfg.scheduler_config

    if name == "multistep":
        milestones = sorted(sc.get("milestones", []))
        gamma = float(sc.get("lr_decay", 0.1))

        def sched(step):
            step = jnp.asarray(step)
            n_passed = sum(jnp.where(step >= m, 1.0, 0.0) for m in milestones)
            return base_lr * gamma**n_passed

        return sched

    if name == "sgdr":
        t0 = float(sc.get("T0", optim_cfg.steps_per_epoch or 1))
        t_mul = float(sc.get("Tmult", 2.0))
        eta_min = float(optim_cfg.lr_min)

        def sched(step):
            # find the warm-restart period containing `step` (bounded search)
            remaining = jnp.asarray(step, jnp.float32)
            ti_now = jnp.float32(t0)
            lr = jnp.float32(base_lr)
            done = jnp.bool_(False)
            for _ in range(32):
                inside = jnp.logical_and(~done, remaining < ti_now)
                frac = jnp.clip(remaining / ti_now, 0.0, 1.0)
                lr = jnp.where(
                    inside,
                    eta_min + (base_lr - eta_min) * 0.5 * (1 + jnp.cos(jnp.pi * frac)),
                    lr,
                )
                advance = jnp.logical_and(~done, ~inside)
                remaining = jnp.where(advance, remaining - ti_now, remaining)
                ti_now = jnp.where(advance, ti_now * t_mul, ti_now)
                done = jnp.logical_or(done, inside)
            return lr

        return sched

    if name == "keras_decay":
        decay = float(sc.get("decay", 1e-4))
        return lambda step: base_lr / (1.0 + decay * jnp.asarray(step, jnp.float32))

    # 'cosine' (LambdaLR form, `utils.py:40-44`): lr_min absolute floor
    total = max(1, optim_cfg.epochs * max(1, optim_cfg.steps_per_epoch))
    lr_min = optim_cfg.lr_min

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        factor = (lr_min / base_lr) + (1 - lr_min / base_lr) * 0.5 * (
            1 + jnp.cos(step / total * jnp.pi)
        )
        return base_lr * factor

    return sched


def make_trainable_mask(
    params: Dict[str, Any],
    frozen_path_substrings: tuple = (),
    always_trainable_substrings: tuple = ("lora_", "layer_weights"),
    stacked_layer_freeze: "Dict[str, Any] | None" = None,
) -> Dict[str, Any]:
    """1/0 mask pytree: 0 for params whose path matches a frozen substring.

    Replaces torch's `requires_grad=False` freezing (freeze_sincnet, WavLM
    layer freezing, LoRA base-freeze): masked grads are zeroed before the
    optimizer, so frozen params never move.  Paths matching an
    `always_trainable` substring (LoRA adapters, the 25-layer weighting) stay
    trainable even inside frozen subtrees.

    ``stacked_layer_freeze`` maps a path substring of a STACKED layer
    subtree (``layers_scan`` for the scan layout, ``layers_pipe`` for the
    pipeline layout — leading axis = layer index) to a per-layer 0/1
    vector.  Matching leaves get the vector broadcast over their trailing
    dims, so `apply_mask` zeroes exactly the frozen layers' lanes — this is
    how ``wavlm_freeze_layers > 0`` (the reference's bottom-N freeze,
    `/root/reference/src/models/DualStreamSEMamba.py:338-370`) is expressed
    under the stacked layouts.
    """

    def is_trainable(path, leaf):
        keys = "/".join(str(getattr(k, "key", getattr(k, "name", ""))) for k in path)
        if any(s in keys for s in always_trainable_substrings):
            return 1.0
        for sub, vec in (stacked_layer_freeze or {}).items():
            if sub in keys:
                v = np.asarray(vec, np.float32)
                return v.reshape(v.shape + (1,) * (np.ndim(leaf) - 1))
        return 0.0 if any(s in keys for s in frozen_path_substrings) else 1.0

    return jax.tree_util.tree_map_with_path(is_trainable, params)


def apply_mask(grads, mask):
    return jax.tree.map(lambda g, m: g * m, grads, mask)

"""Losses: weighted CE, focal, OC-Softmax, supervised contrastive.

Functional ports of `/root/reference/src/loss.py` and the trainer's inline
losses (`src/main.py:271-309`).  Everything is a pure function of
(params?, logits/features, labels) so it composes into one jit'd train step;
OC-Softmax's learnable center is an explicit param pytree created by
`ocsoftmax_init`.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

# class weights of the reference weighted CE: [spoof, bonafide]
CE_CLASS_WEIGHTS = (0.1, 0.9)


def weighted_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    class_weights=CE_CLASS_WEIGHTS,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """torch-`CrossEntropyLoss(weight=w)` semantics: weighted mean over batch.

    Per-sample CE against (optionally label-smoothed) targets, each weighted
    by its true-class weight; normalized by the sum of the weights.
    """
    n_cls = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, n_cls, dtype=logits.dtype)
    q = onehot * (1.0 - label_smoothing) + label_smoothing / n_cls
    w_vec = jnp.asarray(class_weights, dtype=logits.dtype)
    # torch applies the class weight per smoothed-target class term and
    # normalizes by the summed true-class weights
    ce = -jnp.sum(q * w_vec * logp, axis=-1)
    return jnp.sum(ce) / jnp.sum(w_vec[labels])


def weighted_cross_entropy_soft(
    logits: jax.Array,
    targets: jax.Array,
    sample_class: jax.Array,
    class_weights=CE_CLASS_WEIGHTS,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """Weighted CE against soft targets (mixup path); weights keyed by
    `sample_class` (the hard label whose weight torch would use)."""
    n_cls = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    q = targets * (1.0 - label_smoothing) + label_smoothing / n_cls
    w_vec = jnp.asarray(class_weights, dtype=logits.dtype)
    ce = -jnp.sum(q * w_vec * logp, axis=-1)
    return jnp.sum(ce) / jnp.sum(w_vec[sample_class])


def focal_loss(
    logits: jax.Array, labels: jax.Array, alpha: float = 0.25, gamma: float = 2.0
) -> jax.Array:
    """kornia-`FocalLoss` semantics: ``mean(-alpha * (1-p_t)^gamma * log p_t)``
    with a scalar alpha (`src/main.py:297-309`; Phase 6: alpha=0.9 gamma=2.5)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    n_cls = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, n_cls, dtype=logits.dtype)
    p = jnp.exp(logp)
    focal = -alpha * (1.0 - p) ** gamma * logp
    return jnp.mean(jnp.sum(onehot * focal, axis=-1))


def focal_loss_soft(
    logits: jax.Array, targets: jax.Array, alpha: float = 0.25, gamma: float = 2.0
) -> jax.Array:
    """Focal loss against soft (mixup) targets."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    focal = -alpha * (1.0 - p) ** gamma * logp
    return jnp.mean(jnp.sum(targets * focal, axis=-1))


# --- OC-Softmax (one-class softmax with learnable bona-fide center) ---


def ocsoftmax_init(key: jax.Array, feat_dim: int) -> Dict[str, jax.Array]:
    """Learnable center, kaiming-uniform init like the reference."""
    bound = jnp.sqrt(6.0 / ((1 + 0.25**2) * feat_dim))
    center = jax.random.uniform(key, (1, feat_dim), minval=-bound, maxval=bound)
    return {"center": center}


def ocsoftmax_scores(params: Dict[str, jax.Array], feats: jax.Array) -> jax.Array:
    """Cosine similarity of L2-normalized features to the normalized center."""
    w = params["center"]
    w = w / (jnp.linalg.norm(w, axis=1, keepdims=True) + 1e-12)
    x = feats / (jnp.linalg.norm(feats, axis=1, keepdims=True) + 1e-12)
    return (x @ w.T)[:, 0]


def ocsoftmax_loss(
    params: Dict[str, jax.Array],
    feats: jax.Array,
    labels: jax.Array,
    r_real: float = 0.9,
    r_fake: float = 0.5,
    alpha: float = 20.0,
) -> jax.Array:
    scores = ocsoftmax_scores(params, feats)
    y = labels.astype(scores.dtype)
    margin = (1.0 - y) * (scores - r_fake) + y * (r_real - scores)
    return jnp.mean(jax.nn.softplus(alpha * margin))


def supcon_loss(
    features: jax.Array,
    labels: jax.Array,
    temperature: float = 0.07,
    base_temperature: float = 0.07,
) -> jax.Array:
    """Supervised contrastive loss (Khosla et al.), single-view case.

    `features` (B, D) are used as both anchors and contrasts (the reference
    always passes one view); NaN-safe like the reference (`loss.py:148-150`).
    """
    b = features.shape[0]
    sim = (features @ features.T) / temperature
    sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=1, keepdims=True))
    pos_mask = (labels[:, None] == labels[None, :]).astype(features.dtype)
    self_mask = 1.0 - jnp.eye(b, dtype=features.dtype)
    pos_mask = pos_mask * self_mask
    exp_sim = jnp.exp(sim) * self_mask
    log_prob = sim - jnp.log(jnp.sum(exp_sim, axis=1, keepdims=True) + 1e-8)
    denom = jnp.clip(jnp.sum(pos_mask, axis=1), min=1e-8)
    mean_log_prob_pos = jnp.sum(pos_mask * log_prob, axis=1) / denom
    loss = -(temperature / base_temperature) * mean_log_prob_pos
    loss = jnp.where(jnp.isfinite(loss), loss, 0.0)
    return jnp.mean(loss)

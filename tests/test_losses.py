"""Loss parity tests against torch (the reference's loss backend)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from rade_tpu import losses as L


@pytest.fixture()
def logits_labels():
    rng = np.random.RandomState(0)
    logits = rng.randn(16, 2).astype(np.float32)
    labels = rng.randint(0, 2, 16)
    return logits, labels


def test_weighted_ce_matches_torch(logits_labels):
    logits, labels = logits_labels
    ours = L.weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    ref = torch.nn.CrossEntropyLoss(weight=torch.tensor([0.1, 0.9]))(
        torch.tensor(logits), torch.tensor(labels)
    )
    assert float(ours) == pytest.approx(float(ref), rel=1e-5)


def test_weighted_ce_label_smoothing_matches_torch(logits_labels):
    logits, labels = logits_labels
    ours = L.weighted_cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), label_smoothing=0.1
    )
    ref = torch.nn.CrossEntropyLoss(
        weight=torch.tensor([0.1, 0.9]), label_smoothing=0.1
    )(torch.tensor(logits), torch.tensor(labels))
    assert float(ours) == pytest.approx(float(ref), rel=1e-5)


def test_focal_loss_kornia_semantics(logits_labels):
    """Oracle: kornia.losses.FocalLoss = mean(-alpha*(1-p_t)^gamma * log p_t)."""
    logits, labels = logits_labels
    alpha, gamma = 0.9, 2.5
    ours = L.focal_loss(jnp.asarray(logits), jnp.asarray(labels), alpha, gamma)
    p = torch.softmax(torch.tensor(logits), dim=-1)
    pt = p[torch.arange(16), torch.tensor(labels)]
    ref = (-alpha * (1 - pt) ** gamma * torch.log(pt)).mean()
    assert float(ours) == pytest.approx(float(ref), rel=1e-5)


def test_focal_soft_reduces_to_hard(logits_labels):
    logits, labels = logits_labels
    hard = L.focal_loss(jnp.asarray(logits), jnp.asarray(labels), 0.9, 2.5)
    onehot = np.eye(2, dtype=np.float32)[labels]
    soft = L.focal_loss_soft(jnp.asarray(logits), jnp.asarray(onehot), 0.9, 2.5)
    assert float(hard) == pytest.approx(float(soft), rel=1e-6)


def test_ocsoftmax_matches_reference_formula():
    rng = np.random.RandomState(1)
    feats = rng.randn(12, 16).astype(np.float32)
    labels = rng.randint(0, 2, 12)
    import jax

    params = L.ocsoftmax_init(jax.random.PRNGKey(0), 16)
    ours = L.ocsoftmax_loss(params, jnp.asarray(feats), jnp.asarray(labels))

    # torch oracle with the same center
    center = torch.tensor(np.asarray(params["center"]))
    w = torch.nn.functional.normalize(center, p=2, dim=1)
    x = torch.nn.functional.normalize(torch.tensor(feats), p=2, dim=1)
    scores = (x @ w.T).view(-1)
    y = torch.tensor(labels, dtype=torch.float32)
    ref = torch.nn.functional.softplus(
        20.0 * ((1 - y) * (scores - 0.5) + y * (0.9 - scores))
    ).mean()
    assert float(ours) == pytest.approx(float(ref), rel=1e-5)

    # scoring path: bonafide-like features near center score high
    s = L.ocsoftmax_scores(params, jnp.asarray(params["center"]))
    assert float(s[0]) == pytest.approx(1.0, abs=1e-5)


def test_supcon_matches_reference_formula():
    rng = np.random.RandomState(2)
    feats = rng.randn(10, 8).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    labels = rng.randint(0, 2, 10)
    ours = L.supcon_loss(jnp.asarray(feats), jnp.asarray(labels))

    # torch oracle implementing loss.py:49-152 (single view)
    f = torch.tensor(feats)
    lab = torch.tensor(labels).view(-1, 1)
    mask = torch.eq(lab, lab.T).float()
    logits = f @ f.T / 0.07
    logits = logits - logits.max(dim=1, keepdim=True).values.detach()
    logits_mask = 1 - torch.eye(10)
    mask = mask * logits_mask
    exp_logits = torch.exp(logits) * logits_mask
    log_prob = logits - torch.log(exp_logits.sum(1, keepdim=True) + 1e-8)
    mean_log_prob = (mask * log_prob).sum(1) / mask.sum(1).clamp(min=1e-8)
    ref = -(mean_log_prob).mean()
    assert float(ours) == pytest.approx(float(ref), rel=1e-4)

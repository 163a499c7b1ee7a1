"""LR schedule parity vs torch LinearLR->CosineAnnealingLR, masks, optimizer."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from rade_tpu.config import OptimConfig, TrainingConfig
from rade_tpu.train.optim import (
    make_optimizer,
    make_trainable_mask,
    warmup_cosine_schedule,
    wavlm_label_fn,
)


def test_warmup_cosine_matches_torch():
    base_lr, eta_min, total, warmup = 1e-4, 1e-6, 100, 10
    sched = warmup_cosine_schedule(base_lr, total, warmup, 0.1, eta_min)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=base_lr)
    warm = torch.optim.lr_scheduler.LinearLR(
        opt, start_factor=0.1, end_factor=1.0, total_iters=warmup
    )
    cos = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=total - warmup, eta_min=eta_min
    )
    seq = torch.optim.lr_scheduler.SequentialLR(opt, [warm, cos], milestones=[warmup])

    torch_lrs, ours = [], []
    for step in range(total):
        torch_lrs.append(opt.param_groups[0]["lr"])
        ours.append(float(sched(step)))
        opt.step()
        seq.step()
    np.testing.assert_allclose(ours, torch_lrs, rtol=2e-5)


def test_wavlm_label_fn():
    params = {
        "model": {
            "wavlm_stream": {"layer0": {"kernel": jnp.zeros(2)}},
            "classifier": {"kernel": jnp.zeros(2)},
        },
        "loss": {"center": jnp.zeros(2)},
    }
    labels = wavlm_label_fn(params)
    assert labels["model"]["wavlm_stream"]["layer0"]["kernel"] == "wavlm"
    assert labels["model"]["classifier"]["kernel"] == "backbone"
    assert labels["loss"]["center"] == "backbone"


def test_trainable_mask_freezes_paths():
    params = {
        "model": {
            "sinc_stream": {"w": jnp.ones(3)},
            "head": {"w": jnp.ones(3)},
        }
    }
    mask = make_trainable_mask(params, ("sinc_stream",))
    assert float(mask["model"]["sinc_stream"]["w"]) == 0.0
    assert float(mask["model"]["head"]["w"]) == 1.0


def test_optimizer_differential_lr_moves_groups_differently():
    oc = OptimConfig(base_lr=1e-2, wavlm_lr=1e-5, weight_decay=0.0)
    tc = TrainingConfig(warmup_ratio=0.0, warmup_init_factor=1.0)
    tx = make_optimizer(oc, tc, total_optimizer_steps=10, grad_clip_norm=100.0)
    params = {
        "model": {
            "wavlm_stream": {"w": jnp.ones(4)},
            "head": {"w": jnp.ones(4)},
        },
        "loss": {},
    }
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    wavlm_step = float(jnp.abs(updates["model"]["wavlm_stream"]["w"][0]))
    head_step = float(jnp.abs(updates["model"]["head"]["w"][0]))
    assert head_step > 100 * wavlm_step  # 1e-2 vs 1e-5 first adam step

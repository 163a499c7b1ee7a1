"""Sharpness-Aware Minimization (SAM), functional two-grad form.

Port of `/root/reference/src/sam.py` (present-but-dormant in the reference
trainer): perturb w by rho * g / ||g|| (global norm; optionally |w|-adaptive),
take the gradient at the perturbed point, restore, and apply the base
optimizer update with the perturbed gradient.  In JAX this is two `jax.grad`
calls inside one jit — no parameter mutation, no optimizer wrapping.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def global_grad_norm(grads, params=None, adaptive: bool = False) -> jax.Array:
    if adaptive and params is not None:
        sq = jax.tree.map(lambda g, p: jnp.sum((jnp.abs(p) * g) ** 2), grads, params)
    else:
        sq = jax.tree.map(lambda g: jnp.sum(g**2), grads)
    return jnp.sqrt(sum(jax.tree.leaves(sq)))


def sam_perturb(params, grads, rho: float, adaptive: bool = False):
    """w + e(w): climb to the local maximum."""
    norm = global_grad_norm(grads, params, adaptive)
    scale = rho / (norm + 1e-12)

    def ew(p, g):
        return p + (jnp.square(p) if adaptive else 1.0) * g * scale

    return jax.tree.map(ew, params, grads)


def sam_gradient(
    loss_fn: Callable, params, rho: float = 0.05, adaptive: bool = False, *args
) -> Tuple[jax.Array, object]:
    """(loss_at_w, sharpness-aware gradient) for optimizer consumption."""
    loss, grads = jax.value_and_grad(loss_fn)(params, *args)
    params_adv = sam_perturb(params, grads, rho, adaptive)
    sam_grads = jax.grad(loss_fn)(params_adv, *args)
    return loss, sam_grads

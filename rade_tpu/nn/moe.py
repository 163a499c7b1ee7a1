"""Switch-style mixture-of-experts FFN (top-k token routing).

Port of the reference's MoE components
(`/root/reference/legacy_archives/phase3_moe/models/MoEMambaASV.py:331-374`).
Experts are dense-computed and mask-combined — exactly like the reference
(which never dispatches; it weights full expert outputs) — so at 4 experts
this is a handful of batched matmuls, ideal for the MXU.

Two layouts with identical math:

- :class:`SwitchMoE` — per-expert submodules (`expert_0..expert_{X-1}`), the
  parity layout matching the reference's ``nn.ModuleList``.
- :class:`StackedSwitchMoE` — ONE (X, ...) stacked parameter per matrix,
  computed as batched einsums.  This is the **expert-parallel** layout: the
  leading expert axis shards over the mesh's ``model`` axis
  (`rade_tpu/parallel/tp.py` rules), so each device computes only its
  experts for all tokens and the gate-weighted combine becomes one psum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class SwitchGate(nn.Module):
    num_experts: int
    top_k: int = 2
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scores = jax.nn.softmax(nn.Dense(self.num_experts, name="w_gate")(x), axis=-1)
        top_vals, _ = jax.lax.top_k(scores, self.top_k)
        thresh = top_vals[..., -1:]
        mask = (scores >= thresh).astype(scores.dtype)
        masked = scores * mask
        return masked / (jnp.sum(masked, axis=-1, keepdims=True) + self.epsilon)


class ExpertFFN(nn.Module):
    dim: int
    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        h = nn.Dense(self.hidden_dim, name="fc1")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Dense(self.dim, name="fc2")(h)
        return nn.Dropout(self.dropout, deterministic=not train)(h)


class SwitchMoE(nn.Module):
    dim: int
    hidden_dim: int
    num_experts: int = 4
    top_k: int = 2

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        gates = SwitchGate(self.num_experts, self.top_k, name="gate")(x)
        gates = jnp.where(jnp.isnan(gates), 0.0, gates)
        out = jnp.zeros_like(x)
        for i in range(self.num_experts):
            expert_out = ExpertFFN(self.dim, self.hidden_dim, name=f"expert_{i}")(
                x, train
            )
            out = out + gates[..., i : i + 1] * expert_out
        return out


class StackedSwitchMoE(nn.Module):
    """SwitchMoE with stacked (num_experts, ...) parameters.

    Math-identical to :class:`SwitchMoE` (see
    :func:`stack_expert_params` for the layout bridge); the leading expert
    axis is the expert-parallel sharding target.
    """

    dim: int
    hidden_dim: int
    num_experts: int = 4
    top_k: int = 2
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        gates = SwitchGate(self.num_experts, self.top_k, name="gate")(x)
        gates = jnp.where(jnp.isnan(gates), 0.0, gates)

        # per-expert lecun_normal matching nn.Dense (fan from the last 2 dims)
        kinit = nn.initializers.lecun_normal(batch_axis=(0,))
        w1 = self.param(
            "experts_fc1_kernel", kinit, (self.num_experts, self.dim, self.hidden_dim)
        )
        b1 = self.param(
            "experts_fc1_bias", nn.initializers.zeros,
            (self.num_experts, self.hidden_dim),
        )
        w2 = self.param(
            "experts_fc2_kernel", kinit, (self.num_experts, self.hidden_dim, self.dim)
        )
        b2 = self.param(
            "experts_fc2_bias", nn.initializers.zeros, (self.num_experts, self.dim)
        )

        drop = nn.Dropout(self.dropout, deterministic=not train)
        h = jnp.einsum("btd,xdh->btxh", x, w1) + b1[None, None]
        h = drop(jax.nn.gelu(h, approximate=False))
        y = jnp.einsum("btxh,xhd->btxd", h, w2) + b2[None, None]
        y = drop(y)
        # gate-weighted combine over experts: under EP this contraction is
        # the one all-reduce of the layer
        return jnp.einsum("btxd,btx->btd", y, gates)


def stack_expert_params(moe_params: dict, num_experts: int) -> dict:
    """Convert a SwitchMoE param subtree (expert_i/fc{1,2}) to the stacked
    layout, preserving the gate."""
    out = {"gate": moe_params["gate"]}
    for fc, tag in (("fc1", "fc1"), ("fc2", "fc2")):
        out[f"experts_{tag}_kernel"] = jnp.stack(
            [moe_params[f"expert_{i}"][fc]["kernel"] for i in range(num_experts)]
        )
        out[f"experts_{tag}_bias"] = jnp.stack(
            [moe_params[f"expert_{i}"][fc]["bias"] for i in range(num_experts)]
        )
    return out

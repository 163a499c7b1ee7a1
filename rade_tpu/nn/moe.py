"""Switch-style mixture-of-experts FFN (top-k token routing).

Port of the reference's MoE components
(`/root/reference/legacy_archives/phase3_moe/models/MoEMambaASV.py:331-374`).
Experts are dense-computed and mask-combined — exactly like the reference
(which never dispatches; it weights full expert outputs) — so at 4 experts
this is a handful of batched matmuls, ideal for the MXU.  No EP sharding is
needed at this scale; the gate math is identical.
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

"""Full training state: params, BN stats, optimizer, EMA, SWA, RNG, step.

Unlike the reference — which checkpoints only model weights and silently
loses optimizer/scheduler/EMA/SWA state on resume (SURVEY.md §5 "Checkpoint /
resume") — the whole state is one pytree, checkpointed and restored atomically.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Optional[Any]
    swa_params: Optional[Any]
    n_swa: jax.Array  # number of SWA snapshots taken
    step: jax.Array
    rng: jax.Array
    trainable_mask: Any = struct.field(pytree_node=True, default=None)

    @classmethod
    def create(
        cls,
        params,
        batch_stats,
        tx: optax.GradientTransformation,
        rng: jax.Array,
        use_ema: bool = False,
        use_swa: bool = False,
        trainable_mask=None,
    ) -> "TrainState":
        # swa_params is pre-allocated (zeros, n_swa=0) rather than grown on the
        # first snapshot: flipping None -> tree would change the state's pytree
        # structure mid-run and force the donated jit'd train step to recompile
        # after the first new-best epoch (~10 min of wall on the flagship).
        return cls(
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
            swa_params=jax.tree.map(jnp.zeros_like, params) if use_swa else None,
            n_swa=jnp.zeros((), jnp.int32),
            step=jnp.zeros((), jnp.int32),
            rng=rng,
            trainable_mask=trainable_mask,
        )

    @property
    def eval_params(self):
        """EMA params when enabled, else live params (reference eval semantics)."""
        return self.ema_params if self.ema_params is not None else self.params

    def swa_snapshot(self) -> "TrainState":
        """Running average of new-best epoch weights (torchcontrib-SWA style).

        With the pre-allocated zero tree and ``n_swa == 0`` the first snapshot
        reduces to ``(0*0 + p) / 1 = p``, so no None special-case is needed and
        the pytree structure never changes.
        """
        if self.swa_params is None:  # use_swa off; snapshot called directly
            return self.replace(
                swa_params=jax.tree.map(jnp.copy, self.params),
                n_swa=self.n_swa + 1,
            )
        n = self.n_swa.astype(jnp.float32)
        new_swa = jax.tree.map(
            lambda s, p: (s * n + p.astype(s.dtype)) / (n + 1.0),
            self.swa_params, self.params,
        )
        return self.replace(swa_params=new_swa, n_swa=self.n_swa + 1)

"""Sequence parallelism (Megatron-SP style) via GSPMD sharding constraints.

The reference is single-GPU with no parallelism of any kind (SURVEY.md
§2.10).  Round 2 added a 2-D (data, model) mesh with Megatron-style tensor
parallelism of the SSL encoder (`rade_tpu/parallel/tp.py`).  This module
adds the companion *sequence* parallelism: the encoder's residual-stream
activations are sharded along the TIME axis over the same ``model`` mesh
axis in the regions between attention/FFN blocks (LayerNorm, dropout,
residual adds).  With both TP weight shardings and these activation
constraints in place, XLA GSPMD turns each per-layer all-reduce into a
reduce-scatter + all-gather pair and runs the norm/residual/dropout math on
1/n-th of the sequence per device — the standard Megatron-LM
sequence-parallel recipe, expressed declaratively instead of with manual
collectives.

Mechanics: modules opt in per-activation by calling :func:`shard_seq`,
which is a no-op unless a mesh with a >1 ``model`` axis has been
:func:`activate`-d (the trainer does this when it builds a 2-D mesh).  The
constraint silently skips activations whose time axis is not divisible by
the model-axis size, so tiny test shapes and odd frame counts stay correct
(just unsharded).

Caveat: activation is process-global (constraints are baked in when a jit
traces while active).  In multi-host runs whose eval mesh differs from the
train mesh, leave ``sequence_parallel`` off or deactivate around scoring.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS
from .tp import MODEL_AXIS

_ACTIVE: Optional[Mesh] = None


def activate(mesh: Mesh) -> None:
    """Register the mesh whose `model` axis sequence constraints target.

    A mesh without a >1 model axis deactivates (so single-device parity
    runs built after a TP run are unaffected).
    """
    global _ACTIVE
    if int(mesh.shape.get(MODEL_AXIS, 1)) > 1:
        _ACTIVE = mesh
    else:
        _ACTIVE = None


def deactivate() -> None:
    global _ACTIVE
    _ACTIVE = None


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE


def shard_seq(x: jax.Array, time_axis: int = 1) -> jax.Array:
    """Constrain a (B, T, ...) activation to be sharded T-over-`model`
    (and B-over-`data` when divisible).  No-op when inactive or when the
    time dim is not divisible by the model-axis size."""
    mesh = _ACTIVE
    if mesh is None or x.ndim < 2:
        return x
    n_model = int(mesh.shape.get(MODEL_AXIS, 1))
    if n_model <= 1 or x.shape[time_axis] % n_model:
        return x
    spec = [None] * x.ndim
    n_data = int(mesh.shape.get(DATA_AXIS, 1))
    if n_data > 1 and x.shape[0] % n_data == 0:
        spec[0] = DATA_AXIS
    spec[time_axis] = MODEL_AXIS
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))

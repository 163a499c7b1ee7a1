"""Device mesh + sharding utilities.

The reference is single-GPU with no distributed support (SURVEY.md §2.10);
here data parallelism is first-class: one jit'd train step sharded over a
`jax.sharding.Mesh` ('data' axis), batches sharded on ICI, parameters
replicated, gradient all-reduce inserted by XLA SPMD.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None, devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over all (or the first n) devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_replicated(tree, mesh: Mesh):
    """Place a pytree fully replicated on the mesh."""
    sh = replicated(mesh)
    return jax.device_put(tree, sh)


def put_batch(mesh: Mesh, *arrays):
    """Place batch arrays sharded over the data axis (leading dim)."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]


def pad_batch_to_devices(x: np.ndarray, n_devices: int):
    """Pad the leading dim up to a multiple of n_devices; returns (x, n_valid)."""
    n = x.shape[0]
    rem = (-n) % n_devices
    if rem:
        x = np.concatenate([x, np.zeros((rem,) + x.shape[1:], dtype=x.dtype)], axis=0)
    return x, n

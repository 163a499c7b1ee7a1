"""Fast parameter initialization paths.

On the tunneled TPU backend, jit-compiling the flagship's ``model.init``
program costs ~5 minutes (measured round 4: 323 s in ``entry()`` plus another
~330 s inside ``Experiment``) — all of it XLA compile time for a program that
runs once.  Two replacements:

- ``shape_init``: ``jax.eval_shape`` the init (no compile, no execution) and
  materialize the tree on the host with numpy.  Values are structurally
  valid (BN variances are ones, everything else small-normal) but NOT a real
  initialization — for benchmarks, compile checks and layout validation.
- ``cpu_init``: run the REAL initializer on the host CPU backend and
  transfer.  Bit-identical values (threefry is backend-deterministic) at
  ~56 s instead of ~330 s through the relay compile.

The reference has no equivalent concern (torch initializes on host,
`/root/reference/src/main.py:799-812`); this is TPU-runtime plumbing.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def shape_init(model, init_rngs: Dict[str, Any], dummy, seed: int = 0, **kw):
    """Materialize ``model.init``'s variable tree without compiling it.

    Float leaves get 0.02-scale normals except running variances (path leaf
    named ``var``/``v``…ending in 'var'), which get ones so BatchNorm's
    rsqrt stays finite; integer leaves get zeros.
    """
    shapes = jax.eval_shape(
        lambda rngs: model.init(rngs, dummy, train=False, **kw), init_rngs
    )
    # one small normal block, tiled: filling ~320M leaf elements with fresh
    # standard_normal draws costs tens of seconds on this box's single core
    block = (
        np.random.RandomState(seed).standard_normal(65536).astype(np.float32)
        * 0.02
    )

    def leaf(path, s):
        name = str(path[-1]).strip("[]'\"") if path else ""
        if jnp.issubdtype(s.dtype, jnp.floating):
            if name.endswith("var"):
                return jnp.ones(s.shape, s.dtype)
            n = int(np.prod(s.shape)) if s.shape else 1
            vals = np.resize(block, n).reshape(s.shape)
            return jnp.asarray(vals, dtype=s.dtype)
        if jnp.issubdtype(s.dtype, jnp.integer):
            return jnp.zeros(s.shape, s.dtype)
        # PRNG keys and anything exotic: zeros of the right dtype
        return jnp.zeros(s.shape, s.dtype)

    return jax.tree_util.tree_map_with_path(leaf, shapes)


def cpu_init(model, init_rngs: Dict[str, Any], dummy, **kw):
    """Run the real ``model.init`` on the host CPU backend.

    Returns variables committed to the CPU device; callers move them to the
    accelerator (`jax.device_put`) — the trainer's mesh sharding does this
    anyway.  Raises if no CPU backend is available (caller falls back to the
    default-device init).
    """
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        return model.init(init_rngs, jnp.asarray(dummy), train=False, **kw)

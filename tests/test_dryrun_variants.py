"""dryrun_multichip layout variants on the 8-device virtual CPU mesh.

The driver runs ``dryrun_multichip(8)`` with the default (auto) layout —
the 3-D (data=2, pipe=2, model=2) mesh.  These tests exercise the other
two layouts the v5e-8 deployment actually uses (VERDICT r2 item 3c):

- ``data``: pure DP over (8, 1, 1) — the shipped Phase6_TPU.conf layout;
- ``fsdp``: DP + ZeRO-sharded params/opt-state/EMA over the data axis.

Each runs ONE full Phase-6 train step (mixup + focal + FGM double-grad +
accumulation + EMA + LoRA masking) sharded over all 8 devices.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge


@pytest.mark.slow
@pytest.mark.parametrize("layout", ["data", "fsdp"])
def test_dryrun_layout(layout, monkeypatch):
    monkeypatch.setenv("RADE_DRYRUN_LAYOUT", layout)
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_fsdp_layout_actually_shards(monkeypatch):
    """The fsdp variant must leave large leaves sharded over `data`."""
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rade_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from rade_tpu.train.loop import Experiment

    cfg = ge._phase6_cfg(tiny=True, fsdp=True)
    mesh = make_mesh(8, devices=jax.devices("cpu")[:8])
    exp = Experiment(cfg, seed=0, mesh=mesh)
    state = exp.setup_training(steps_per_epoch=4)

    n_sharded = 0
    for leaf in jax.tree.leaves(state.params):
        if not hasattr(leaf, "sharding"):
            continue
        spec = getattr(leaf.sharding, "spec", None)
        if spec is not None and any(
            DATA_AXIS in ((s,) if isinstance(s, str) else tuple(s or ()))
            for s in spec
        ):
            assert leaf.size >= 256
            n_sharded += 1
    assert n_sharded >= 10, f"only {n_sharded} param leaves fsdp-sharded"

"""Tensor parallelism: Megatron-style sharding of the SSL encoder over a
2-D (data, model) device mesh.

The reference is single-GPU (SURVEY.md §2.10); round 1 added data
parallelism.  This module adds the second mesh axis: WavLM/XLS-R attention
and feed-forward weights are sharded over ``model`` so one set of encoder
weights (and its activations' FLOPs) is split across chips, with XLA GSPMD
inserting the two classic all-reduces per layer (after ``out_proj`` and
after ``output_dense``).

Design: shardings are expressed as *path-substring rules* applied uniformly
to every parameter-shaped tree in the TrainState (params, ema_params,
swa_params, optimizer mu/nu, grads).  Optax state leaves carry the parameter
path as a suffix of their own tree path, so a single rule function covers
them all — no per-transform special cases.

Column/row pairing (so each encoder layer needs exactly two collectives):

- ``q/k/v_proj`` kernels: output (last) dim over ``model`` (column-parallel;
  splits attention heads: E = H*hd and E % n_model == 0 keeps heads whole
  for WavLM-Large's H=16, hd=64 at n_model in {2,4,8,16}).
- ``out_proj`` kernel inside an attention block: input dim over ``model``
  (row-parallel) -> psum; bias replicated.
- ``intermediate_dense`` kernel: output dim (column); ``output_dense``
  kernel: input dim (row) -> psum; bias replicated.
- LoRA: ``lora_B_{q,v}_proj`` output dim over ``model`` (its add lands on a
  column-sharded activation); ``lora_A_*`` replicated (rank is tiny).
- Everything else (sinc stream, Mamba, fusion, classifier, feature
  extractor, biases of row-parallel layers, norms) replicated.

A dim is only sharded when divisible by the mesh's model-axis size —
otherwise the leaf silently stays replicated, so tiny test configs and odd
modules are always safe.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS

MODEL_AXIS = "model"


def make_mesh_2d(
    n_data: int, n_model: int, devices: Optional[Sequence] = None
) -> Mesh:
    """(data, model) mesh; the model axis is minor (adjacent devices form a
    model group, so the per-layer all-reduces ride the fastest ICI links)."""
    devs = list(devices) if devices is not None else jax.devices()
    if len(devs) < n_data * n_model:
        raise ValueError(
            f"need {n_data * n_model} devices for a ({n_data}, {n_model}) "
            f"mesh, have {len(devs)}"
        )
    grid = np.array(devs[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def model_axis_size(mesh: Mesh) -> int:
    return int(mesh.shape.get(MODEL_AXIS, 1))


def _path_str(path) -> str:
    return "/".join(
        str(
            getattr(k, "key", getattr(k, "name", getattr(k, "idx", k)))
        )
        for k in path
    )


# (required substrings, leaf name, sharded dim from the end: 1 = last/output
# dim [column-parallel], 2 = second-to-last/input dim [row-parallel])
_RULES: Tuple[Tuple[Tuple[str, ...], str, int], ...] = (
    (("attention", "q_proj"), "kernel", 1),
    (("attention", "k_proj"), "kernel", 1),
    (("attention", "v_proj"), "kernel", 1),
    (("attention", "q_proj"), "bias", 1),
    (("attention", "k_proj"), "bias", 1),
    (("attention", "v_proj"), "bias", 1),
    (("attention", "out_proj"), "kernel", 2),
    (("attention", "lora_B_q_proj"), "", 1),
    (("attention", "lora_B_v_proj"), "", 1),
    (("feed_forward", "intermediate_dense"), "kernel", 1),
    (("feed_forward", "intermediate_dense"), "bias", 1),
    (("feed_forward", "output_dense"), "kernel", 2),
    # expert parallelism: StackedSwitchMoE's leading expert axis
    # (rade_tpu/nn/moe.py) shards over the same `model` axis — each device
    # computes its experts for all tokens; the gate-weighted combine einsum
    # is the layer's one all-reduce
    (("moe_",), "experts_fc1_kernel", 3),
    (("moe_",), "experts_fc1_bias", 2),
    (("moe_",), "experts_fc2_kernel", 3),
    (("moe_",), "experts_fc2_bias", 2),
)


def spec_for_path(path: str, shape: Tuple[int, ...], n_model: int) -> P:
    """PartitionSpec for one leaf; P() (replicated) when no rule matches or
    the target dim is not divisible by the model-axis size.

    Rules are position-independent of stacking: a scan-over-layers kernel
    (L, E, E) and an unrolled kernel (E, E) get the same from-the-end dim.
    """
    ndim = len(shape)
    if n_model <= 1 or ndim == 0:
        return P()
    for substrings, leaf_name, dim_from_end in _RULES:
        if not all(s in path for s in substrings):
            continue
        if leaf_name and not path.endswith("/" + leaf_name):
            continue
        if ndim < dim_from_end:
            return P()
        axis = ndim - dim_from_end
        if shape[axis] % n_model:
            return P()  # not divisible: stay replicated (safe fallback)
        spec = [None] * ndim
        spec[axis] = MODEL_AXIS
        return P(*spec)
    return P()


def fsdp_spec(
    spec: P, shape: Tuple[int, ...], n_data: int, min_size: int
) -> P:
    """Compose a ZeRO/FSDP sharding onto ``spec``: shard the largest
    still-unsharded axis divisible by the data-axis size over ``data``.

    Leaves smaller than ``min_size`` elements (BN stats, biases, norms,
    LoRA-A) stay as-is — all-gathering tiny tensors costs more latency than
    the memory they would save.  Returns ``spec`` unchanged when no axis
    qualifies, so odd shapes are always safe (just replicated)."""
    ndim = len(shape)
    if n_data <= 1 or ndim == 0 or int(np.prod(shape)) < min_size:
        return spec
    s = list(spec) + [None] * (ndim - len(spec))
    candidates = [
        i for i in range(ndim) if s[i] is None and shape[i] % n_data == 0
    ]
    if not candidates:
        return spec
    axis = max(candidates, key=lambda i: shape[i])
    s[axis] = DATA_AXIS
    return P(*s)


def shard_tree(tree: Any, mesh: Mesh, fsdp: bool = False, fsdp_min_size: int = 16384):
    """device_put every leaf of a (TrainState-like) pytree with its rule
    sharding; non-array leaves (python scalars, None) become replicated.

    On meshes with a ``pipe`` axis, ``layers_pipe`` leaves (the stacked
    pipeline-parallel WavLM layers, nn/wavlm_pp.py) additionally shard
    their leading layer axis over ``pipe`` — composing with the
    tensor-parallel column/row rules on the trailing dims.

    ``fsdp`` adds ZeRO-style fully-sharded data parallelism: each large
    leaf's biggest remaining axis is sharded over ``data`` (`fsdp_spec`).
    The jit'd train step picks the shardings up from the donated state, so
    GSPMD all-gathers weights at their use sites and reduce-scatters the
    gradients — per-chip param+optimizer+EMA+SWA memory drops ~n_data-fold
    with no change to the step function."""
    n_model = model_axis_size(mesh)
    from .pp import PIPE_AXIS  # local: pp imports tp at module level

    n_pipe = int(mesh.shape.get(PIPE_AXIS, 1))
    n_data = int(mesh.shape.get(DATA_AXIS, 1))

    def put(path, leaf):
        shape = tuple(getattr(leaf, "shape", ()))
        p = _path_str(path)
        spec = spec_for_path(p, shape, n_model)
        if (
            n_pipe > 1 and "layers_pipe" in p
            and shape and shape[0] % n_pipe == 0
        ):
            s = list(spec) + [None] * (len(shape) - len(spec))
            s[0] = PIPE_AXIS
            spec = P(*s)
        if fsdp:
            spec = fsdp_spec(spec, shape, n_data, fsdp_min_size)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, tree)


def describe_sharding(params: Any, mesh: Mesh, max_rows: int = 12) -> str:
    """Human-readable summary of which leaves the rules shard (for logs)."""
    n_model = model_axis_size(mesh)
    rows = []
    total = sharded = 0

    def visit(path, leaf):
        nonlocal total, sharded
        total += 1
        shape = tuple(getattr(leaf, "shape", ()))
        spec = spec_for_path(_path_str(path), shape, n_model)
        if any(a is not None for a in spec):
            sharded += 1
            if len(rows) < max_rows:
                rows.append(f"  {_path_str(path)} {shape} -> {spec}")
        return leaf

    jax.tree_util.tree_map_with_path(visit, params)
    head = (
        f"tensor-parallel over {MODEL_AXIS}={n_model}: "
        f"{sharded}/{total} param leaves sharded"
    )
    if sharded > max_rows:
        rows.append(f"  ... and {sharded - max_rows} more")
    return "\n".join([head] + rows)

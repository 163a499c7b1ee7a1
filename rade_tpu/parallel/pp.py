"""Pipeline parallelism (GPipe) over a mesh ``pipe`` axis.

The reference is single-GPU with no parallelism (SURVEY.md §2.10).  This
module adds the last of the classic parallelism axes to the TPU build
(after data, tensor, sequence and expert parallelism): a *differentiable*
GPipe microbatch pipeline, expressed with `jax.shard_map` + `ppermute` +
`lax.scan` so the backward pipeline (reverse schedule) falls out of JAX's
transpose rules instead of being hand-scheduled.

Design:

- Layer parameters are STACKED along a leading layer axis L and sharded
  L-over-``pipe``: each of the S stages holds L/S contiguous layers and
  scans them locally.
- The batch is split into M microbatches.  At tick t (of M + S - 1), stage
  s processes microbatch t - s; activations move stage->stage+1 with one
  `ppermute` per tick (point-to-point on ICI, no all-to-all).
- Stage 0 feeds fresh microbatches; the last stage's outputs (and the
  per-stage weighted tap sums, see below) are accumulated into one-hot
  slots and combined with a single `psum` after the loop — the bubble is
  the usual (S-1)/(M+S-1) fraction.
- `tap_weights` supports WavLM's 25-hidden-state weighted sum without ever
  materializing the hidden states: each stage accumulates
  sum_l w_l * h_l for its local layers and the final psum adds the stage
  partials (the weighted sum is linear, so this is exact).
- Only the ``pipe`` axis is manual (`axis_names={PIPE_AXIS}`): batch
  sharding over ``data`` and Megatron tensor parallelism over ``model``
  stay in GSPMD's hands, so dp x tp x pp compose on one mesh.

The reference semantics being distributed is the WavLM encoder layer stack
(`/root/reference/src/models/DualStreamSEMamba.py:276-439` via HF
WavLMModel); the pipelined functional forward lives in
`rade_tpu/nn/wavlm_pp.py`.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS
from .tp import MODEL_AXIS

PIPE_AXIS = "pipe"

_ACTIVE: Optional[Mesh] = None


def activate(mesh: Optional[Mesh]) -> None:
    """Register the mesh whose `pipe` axis pipeline stages run over.

    A mesh without a >1 pipe axis deactivates (the functional forwards then
    fall back to the sequential in-chip scan)."""
    global _ACTIVE
    if mesh is not None and int(mesh.shape.get(PIPE_AXIS, 1)) > 1:
        _ACTIVE = mesh
    else:
        _ACTIVE = None


def deactivate() -> None:
    global _ACTIVE
    _ACTIVE = None


def active_mesh() -> Optional[Mesh]:
    return _ACTIVE


def pipe_axis_size(mesh: Optional[Mesh]) -> int:
    if mesh is None:
        return 1
    return int(mesh.shape.get(PIPE_AXIS, 1))


def make_mesh_pp(
    n_data: int, n_pipe: int, n_model: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """(data, pipe, model) mesh.  ``model`` is minor-most (its per-layer
    all-reduces are the most frequent collective, so they ride adjacent
    ICI links); ``pipe`` neighbors exchange activations once per tick."""
    devs = list(devices) if devices is not None else jax.devices()
    need = n_data * n_pipe * n_model
    if len(devs) < need:
        raise ValueError(
            f"need {need} devices for a ({n_data}, {n_pipe}, {n_model}) "
            f"mesh, have {len(devs)}"
        )
    grid = np.array(devs[:need]).reshape(n_data, n_pipe, n_model)
    return Mesh(grid, (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))


def _sequential_apply(
    layer_fn: Callable,
    stacked_params: Any,
    x: jax.Array,
    n_micro: int,
    *,
    tap_weights: Optional[jax.Array],
    layer_keys: Optional[jax.Array],
    extra: Any = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """S == 1 fallback: bit-identical math to the pipeline (including the
    per-microbatch rng fold), as one sequential scan over microbatches."""
    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    M = int(n_micro) or 1
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} not divisible by n_micro {M}")
    x_m = x.reshape((M, B // M) + x.shape[1:])
    keys = (
        layer_keys
        if layer_keys is not None
        else jnp.zeros((L, 2), jnp.uint32)
    )
    w = (
        tap_weights.astype(x.dtype)
        if tap_weights is not None
        else jnp.zeros((L,), x.dtype)
    )

    def per_micro(_, inp):
        m, xm = inp

        def one(carry, layer_inp):
            h, acc = carry
            p_j, k_j, w_j = layer_inp
            h = layer_fn(p_j, h, k_j, m, extra)
            acc = acc + w_j * h
            return (h, acc), None

        (y, acc), _ = lax.scan(
            one, (xm, jnp.zeros_like(xm)), (stacked_params, keys, w)
        )
        return None, (y, acc)

    _, (ys, accs) = lax.scan(per_micro, None, (jnp.arange(M), x_m))
    y = ys.reshape((B,) + x.shape[1:])
    if tap_weights is None:
        return y, None
    return y, accs.reshape((B,) + x.shape[1:])


def pipeline_apply(
    layer_fn: Callable,
    stacked_params: Any,
    x: jax.Array,
    mesh: Optional[Mesh] = None,
    n_micro: int = 0,
    *,
    tap_weights: Optional[jax.Array] = None,
    layer_keys: Optional[jax.Array] = None,
    extra: Any = None,
) -> Tuple[jax.Array, Optional[jax.Array]]:
    """Run ``x`` through L stacked layers, pipelined over the ``pipe`` axis.

    Args:
      layer_fn: ``(layer_params_j, h, key_raw_j, microbatch_idx, extra) ->
        h`` — one layer, shape-preserving.  ``key_raw_j`` is this layer's
        row of ``layer_keys`` (fold in ``microbatch_idx`` for
        per-microbatch dropout); ignore it for deterministic layers.
        ``extra`` is the broadcast pytree below.
      stacked_params: pytree whose leaves have a leading layer axis L
        (L % pipe_size == 0).
      x: ``(B, ...)`` activations; ``B % n_micro == 0``.
      mesh: mesh with a ``pipe`` axis (defaults to the activated one); a
        missing/size-1 pipe axis runs the sequential fallback.
      n_micro: number of microbatches M (>= pipe size for a small bubble).
        0/None defaults to the pipe size.
      tap_weights: optional ``(L,)`` — also return ``sum_l w_l * h_l``
        (per-layer-output weighted sum), computed without materializing
        the L hidden states.
      layer_keys: optional ``(L, key_width)`` uint32 raw PRNG key data
        (``jax.random.key_data``), sharded with the layers.
      extra: optional pytree broadcast (replicated along ``pipe``) to every
        layer call — e.g. a shared attention position bias.

    Returns ``(y, weighted_taps)``: the final layer's output ``(B, ...)``
    and the tap sum (or None).  Fully differentiable — the backward is the
    reverse pipeline via JAX transposition.
    """
    mesh = mesh if mesh is not None else _ACTIVE
    S = pipe_axis_size(mesh)
    if S <= 1:
        return _sequential_apply(
            layer_fn, stacked_params, x, n_micro,
            tap_weights=tap_weights, layer_keys=layer_keys, extra=extra,
        )

    L = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if L % S:
        raise ValueError(f"{L} layers not divisible by pipe axis {S}")
    M = int(n_micro) or S
    B = x.shape[0]
    if B % M:
        raise ValueError(f"batch {B} not divisible by n_micro {M}")
    x_m = x.reshape((M, B // M) + x.shape[1:])

    has_taps = tap_weights is not None
    keys = (
        layer_keys
        if layer_keys is not None
        else jnp.zeros((L, 2), jnp.uint32)
    )
    w = (
        tap_weights.astype(x.dtype)
        if has_taps
        else jnp.zeros((L,), x.dtype)
    )
    fwd_perm = [(i, i + 1) for i in range(S - 1)]

    def body(params_l, keys_l, w_l, x_m, extra):
        stage = lax.axis_index(PIPE_AXIS)

        def apply_stage(h, m):
            def one(carry, inp):
                h, acc = carry
                p_j, k_j, w_j = inp
                h = layer_fn(p_j, h, k_j, m, extra)
                acc = acc + w_j * h
                return (h, acc), None

            (h, c), _ = lax.scan(
                one, (h, jnp.zeros_like(h)), (params_l, keys_l, w_l)
            )
            return h, c

        def tick(carry, t):
            h_in, acc, y = carry
            mb = jnp.clip(t, 0, M - 1)
            x_t = lax.dynamic_index_in_dim(x_m, mb, 0, keepdims=False)
            h = jnp.where(stage == 0, x_t, h_in)
            m = t - stage  # the microbatch this stage holds at tick t
            h_out, c = apply_stage(h, jnp.clip(m, 0, M - 1))
            valid = (m >= 0) & (m < M)
            sel = ((jnp.arange(M) == m) & valid).astype(h_out.dtype)
            sel = sel.reshape((M,) + (1,) * h_out.ndim)
            if has_taps:
                acc = acc + sel * c[None]
            is_last = (stage == S - 1).astype(h_out.dtype)
            y = y + is_last * sel * h_out[None]
            h_next = lax.ppermute(h_out, PIPE_AXIS, fwd_perm)
            return (h_next, acc, y), None

        # the zero-init carry is pipe-invariant but each tick makes it
        # varying (stage-dependent values); cast the init to match
        buf = jnp.zeros((M,) + x_m.shape[1:], x_m.dtype)
        init = jax.tree.map(
            lambda a: lax.pcast(a, PIPE_AXIS, to="varying"),
            (jnp.zeros_like(x_m[0]), buf, buf),
        )
        (_, acc, y), _ = lax.scan(tick, init, jnp.arange(M + S - 1))
        # y is nonzero only on the last stage; acc holds per-stage partial
        # weighted sums — one psum each makes them pipe-invariant outputs
        y = lax.psum(y, PIPE_AXIS)
        acc = lax.psum(acc, PIPE_AXIS)
        return y, acc

    pspec = jax.tree.map(lambda _: P(PIPE_AXIS), stacked_params)
    espec = jax.tree.map(lambda _: P(), extra)
    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(pspec, P(PIPE_AXIS), P(PIPE_AXIS), P(), espec),
        out_specs=(P(), P()),
        axis_names={PIPE_AXIS},
    )
    y, acc = fn(stacked_params, keys, w, x_m, extra)
    y = y.reshape((B,) + x.shape[1:])
    if not has_taps:
        return y, None
    return y, acc.reshape((B,) + x.shape[1:])

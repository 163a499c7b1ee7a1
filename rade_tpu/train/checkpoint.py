"""Full-train-state checkpointing (msgpack via flax.serialization).

Fixes the reference's resume gap (only model weights were saved —
`/root/reference/src/main.py:602-664`): here params, BN stats, optimizer
state, EMA, SWA, RNG and step all round-trip.  File conventions mirror the
reference: EER-stamped best files with old-best deletion, periodic
``checkpoint_epoch_*`` keep-last-3, ``swa`` and ``best`` snapshots.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Optional

from flax import serialization


def _fetch(tree):
    """One bulk device->host transfer before serializing.

    ``flax.serialization.to_bytes`` calls ``np.asarray`` leaf-by-leaf as the
    msgpack encoder walks the tree — on the axon TPU relay each of those is a
    synchronous round-trip, which serializes a multi-GB WavLM-Large train
    state into minutes of blocking readbacks.  ``jax.device_get`` on the
    whole tree issues every copy up front and overlaps them.
    """
    import jax

    return jax.device_get(tree)


def save_state(path, state) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(_fetch(state)))


def restore_state(path, template):
    """Restore into a structurally-identical template state."""
    with open(path, "rb") as f:
        raw = f.read()
    try:
        return serialization.from_bytes(template, raw)
    except Exception as e:
        # Distinguish the two failure shapes so the error does not tell a
        # user who DID pass a checkpoint_epoch_* file to go find one: a
        # reduced best/swa file has no opt_state, while a genuine full-state
        # file that still fails has a structure mismatch (e.g. written by a
        # different config, or by an older code version with a different
        # TrainState layout).
        is_full = False
        try:
            import msgpack

            is_full = "opt_state" in msgpack.unpackb(raw, strict_map_key=False)
        except Exception:
            pass
        if is_full:
            raise ValueError(
                f"{path} holds a full train state but its structure does not "
                f"match this run's TrainState ({e}) — was it written by a "
                "different config (model/optimizer/EMA/SWA flags) or an "
                "older version? Warm-start the weights instead via "
                "--pretrained_weights (strict=False merge)"
            ) from e
        raise ValueError(
            f"{path} does not hold a full train state ({e}); best/swa files "
            "carry scoring weights only (reference parity) — resume from a "
            "checkpoint_epoch_* file, or load this one via load_eval_weights"
        ) from e


def scoring_tree(state):
    """Reduced checkpoint for best/swa files: scoring weights only.

    Reference parity: the torch trainer's EER-stamped best files and
    ``best.pth``/``swa.pth`` hold ``model.state_dict()`` — no optimizer state
    (`/root/reference/src/main.py:616-618,634-638,686-687`).  Keeping that
    shape here cuts best-epoch save traffic ~2.5x (the optimizer tree stays
    on device); full-state files for `--resume` are the periodic
    ``checkpoint_epoch_*`` saves.  The layout matches the full-TrainState
    branch of :func:`load_eval_weights` (``params``/``ema_params``/
    ``batch_stats``).
    """
    return {
        "params": state.params,
        "ema_params": state.ema_params,
        "batch_stats": state.batch_stats,
        "step": state.step,
    }


def save_params(path, params) -> None:
    save_state(path, params)


def restore_params(path, template):
    return restore_state(path, template)


def merge_matching(template, raw, stats=None):
    """Best-effort partial load: copy leaves whose path AND shape match the
    template, keep the template value elsewhere (the reference's
    `load_state_dict(strict=False)` semantics, `src/main.py:245-258`).

    ``stats``, if given, is a dict whose ``"loaded"``/``"kept"`` counters are
    incremented per leaf so callers can report how much actually matched.
    """
    import numpy as np

    def _count(key, tree):
        if stats is not None:
            import jax

            stats[key] = stats.get(key, 0) + len(jax.tree.leaves(tree))

    if isinstance(template, dict):
        if not isinstance(raw, dict):
            _count("kept", template)
            return template
        out = {}
        for k, v in template.items():
            if k in raw:
                out[k] = merge_matching(v, raw[k], stats)
            else:
                _count("kept", v)
                out[k] = v
        return out
    try:
        arr = np.asarray(raw)
        if arr.shape == np.shape(template):
            _count("loaded", template)
            return arr.astype(np.asarray(template).dtype)
    except Exception:
        pass
    _count("kept", template)
    return template


def bridge_wavlm_layout(src, template):
    """Convert a checkpoint's WavLM encoder layout to the target's.

    A Phase-5 unrolled checkpoint (`layers_1..N-1`) can warm-start or be
    scored under a `wavlm_scan_layers` config (stacked `layers_scan/layer`)
    or a pipeline-parallel run (stacked `layers_pipe`, nn/wavlm_pp.py) and
    vice versa; without the conversion the whole encoder silently keeps its
    init (non-strict load) or the strict restore fails.  Best-effort:
    returns `src` unchanged when the layouts already agree or the trees
    don't look like a WavLM model."""
    try:
        s = src["model"]["wavlm_stream"]["model"]
        t = template["model"]["wavlm_stream"]["model"]
    except (KeyError, TypeError):
        return src
    from rade_tpu.nn.wavlm_pp import convert_layout, detect_layout

    target = detect_layout(t)
    if target is None or detect_layout(s) == target:
        return src
    try:
        converted = convert_layout(s, target)
    except Exception:
        return src
    return {
        **src,
        "model": {
            **src["model"],
            "wavlm_stream": {**src["model"]["wavlm_stream"], "model": converted},
        },
    }


def load_eval_weights(path, params_template, batch_stats_template):
    """Load scoring weights from EITHER checkpoint layout.

    Accepts (a) a full ``TrainState`` file written by the trainer
    (best/periodic/swa) — preferring EMA parameters when present, matching
    the reference's EMA-model-for-eval semantics
    (`/root/reference/src/main.py:556,1112-1113`) — or (b) a reduced
    ``{"model", "loss", "batch_stats"}`` tree (e.g. `tools/import_torch.py`
    output).  Returns ``(params, batch_stats)`` matching the templates'
    structure, where ``params`` is the ``{"model", "loss"}`` tree.
    """
    with open(path, "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if "params" in raw:  # full TrainState
        src = raw["params"]
        ema = raw.get("ema_params")
        if ema:
            src = ema
        stats_raw = raw["batch_stats"]
    elif "model" in raw:  # reduced tree
        src = {"model": raw["model"], "loss": raw.get("loss", {})}
        stats_raw = raw["batch_stats"]
    else:
        raise ValueError(
            f"unrecognized checkpoint layout in {path}: keys {sorted(raw)[:8]}"
        )
    src = bridge_wavlm_layout(src, params_template)
    params = serialization.from_state_dict(params_template, src)
    batch_stats = serialization.from_state_dict(batch_stats_template, stats_raw)
    return params, batch_stats


class CheckpointManager:
    """Best/periodic checkpoint policy of the reference trainer."""

    def __init__(self, weights_dir, keep_last: int = 3):
        self.dir = Path(weights_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep_last = keep_last
        self._best_file: Optional[Path] = None

    def save_best(self, state, epoch: int, dev_eer: float) -> Path:
        """EER-stamped best file; deletes the previous best (`main.py:602-618`).

        Scoring weights only, like the reference's ``epoch_{e}_{eer}.pth``.
        """
        path = self.dir / f"epoch_{epoch}_{dev_eer:03.3f}.ckpt"
        save_state(path, scoring_tree(state))
        if self._best_file is not None and self._best_file.exists():
            self._best_file.unlink()
        self._best_file = path
        return path

    def save_periodic(self, state, epoch: int) -> Path:
        """checkpoint_epoch_N, keeping only the newest `keep_last`."""
        path = self.dir / f"checkpoint_epoch_{epoch}.ckpt"
        save_state(path, state)
        ckpts = sorted(
            self.dir.glob("checkpoint_epoch_*.ckpt"),
            key=lambda p: int(re.search(r"epoch_(\d+)", p.name).group(1)),
        )
        for old in ckpts[: -self.keep_last]:
            old.unlink()
        return path

    def save_named(self, state, name: str, scoring_only: bool = True) -> Path:
        """``best``/``swa`` snapshots — scoring weights by default, matching
        the reference's ``best.pth``/``swa.pth`` model-state-dict files."""
        path = self.dir / f"{name}.ckpt"
        save_state(path, scoring_tree(state) if scoring_only else state)
        return path

    @property
    def best_path(self) -> Optional[Path]:
        return self._best_file

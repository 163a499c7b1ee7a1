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


def save_state(path, state) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))


def restore_state(path, template):
    """Restore into a structurally-identical template state."""
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_params(path, params) -> None:
    save_state(path, params)


def restore_params(path, template):
    return restore_state(path, template)


class CheckpointManager:
    """Best/periodic checkpoint policy of the reference trainer."""

    def __init__(self, weights_dir, keep_last: int = 3):
        self.dir = Path(weights_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.keep_last = keep_last
        self._best_file: Optional[Path] = None

    def save_best(self, state, epoch: int, dev_eer: float) -> Path:
        """EER-stamped best file; deletes the previous best (`main.py:602-618`)."""
        path = self.dir / f"epoch_{epoch}_{dev_eer:03.3f}.ckpt"
        save_state(path, state)
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

    def save_named(self, state, name: str) -> Path:
        path = self.dir / f"{name}.ckpt"
        save_state(path, state)
        return path

    @property
    def best_path(self) -> Optional[Path]:
        return self._best_file

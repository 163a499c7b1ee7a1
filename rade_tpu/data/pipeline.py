"""Host batching pipeline with background prefetch and device sharding.

Replaces the reference's `torch.utils.data.DataLoader` workers
(`/root/reference/src/main.py:914-953`) with a thread-prefetched numpy
batcher.  Batches are always statically shaped (eval pads the final partial
batch and reports the valid count) so every jit'd step reuses one executable;
`shard_batches` places batches on a `jax.sharding.Mesh` for data-parallel
steps.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Sequence, Tuple

import numpy as np


class TrainBatcher:
    """Shuffled, drop-last batching over a map-style dataset.

    Seeded shuffle per epoch (epoch index mixes into the seed), mirroring the
    reference's seeded-generator DataLoader shuffle.
    """

    def __init__(
        self, dataset, batch_size: int, seed: int = 0, drop_last: bool = True,
        process_index: int = 0, process_count: int = 1, native: bool = True,
    ):
        """`batch_size` is the GLOBAL batch; with multiple processes each
        host materializes only its `batch_size / process_count` rows of every
        batch (identical permutation on all hosts via the shared seed).

        ``native=True`` (default) decodes whole micro-batches in the C++
        loader thread pool when the dataset supports it
        (``dataset.native_batch``), falling back to the per-sample Python
        path otherwise."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.drop_last = drop_last
        self.native = native
        if batch_size % process_count:
            raise ValueError(
                f"batch_size {batch_size} not divisible by {process_count} processes"
            )
        self.process_index = process_index
        self.process_count = process_count

    def __len__(self) -> int:
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def epoch_indices(self, epoch_idx: int) -> Iterator[np.ndarray]:
        """This process's dataset indices per micro-batch (seeded shuffle)."""
        rng = np.random.RandomState(self.seed + 1000003 * epoch_idx)
        order = rng.permutation(len(self.dataset))
        n_batches = len(self)
        per = self.batch_size // self.process_count
        lo = self.process_index * per
        for b in range(n_batches):
            yield order[
                b * self.batch_size : (b + 1) * self.batch_size
            ][lo : lo + per].astype(np.int32)

    def epoch(self, epoch_idx: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        native_fn = (
            getattr(self.dataset, "native_batch", None) if self.native else None
        )
        crop_rng = np.random.RandomState(
            (self.seed * 2246822519 + 2654435761 * epoch_idx + 1) % (2**31 - 1)
        )
        for idxs in self.epoch_indices(epoch_idx):
            if native_fn is not None:
                try:
                    out = native_fn(idxs, crop_rng)
                except (ImportError, OSError) as e:  # no toolchain / bad .so
                    print(f"native loader unavailable ({e}); using Python path")
                    out = None
                    native_fn = None
                if out is not None:
                    yield out
                    continue
                native_fn = None  # dataset can't serve natively; stop probing
            xs, ys = zip(*(self.dataset[int(i)] for i in idxs))
            yield np.stack(xs), np.asarray(ys, dtype=np.int32)


class EvalBatcher:
    """Order-preserving batching; final batch zero-padded to full size.

    Yields ``(x, keys, n_valid)`` so scoring can drop padded rows while the
    jit'd forward keeps a single static shape.
    """

    def __init__(self, dataset, batch_size: int, native: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.native = native

    def __len__(self) -> int:
        return -(-len(self.dataset) // self.batch_size)

    def __iter__(self) -> Iterator[Tuple[np.ndarray, Sequence[str], int]]:
        n = len(self.dataset)
        native_fn = (
            getattr(self.dataset, "native_batch", None) if self.native else None
        )
        for b in range(len(self)):
            lo = b * self.batch_size
            hi = min(lo + self.batch_size, n)
            out = None
            if native_fn is not None:
                try:
                    out = native_fn(lo, hi)
                except (ImportError, OSError) as e:
                    print(f"native loader unavailable ({e}); using Python path")
                if out is None:
                    native_fn = None
            if out is not None:
                xs, keys = out
                keys = list(keys)
            else:
                items = [self.dataset[i] for i in range(lo, hi)]
                xs = np.stack([it[0] for it in items])
                keys = [it[1] for it in items]
            n_valid = hi - lo
            if n_valid < self.batch_size:
                padrows = np.zeros(
                    (self.batch_size - n_valid,) + xs.shape[1:], dtype=xs.dtype
                )
                xs = np.concatenate([xs, padrows], axis=0)
            yield xs, keys, n_valid


def prefetch(iterable: Iterable, depth: int = 2) -> Iterator:
    """Run the producer in a background thread, keeping `depth` items ready.

    Overlaps host-side audio decode + augmentation with device compute.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list = []

    def producer():
        try:
            for item in iterable:
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            err.append(e)
        finally:
            q.put(sentinel)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


def shard_batch(batch_sharding, *arrays):
    """Place host arrays onto the mesh with the given sharding."""
    import jax

    return tuple(jax.device_put(a, batch_sharding) for a in arrays)

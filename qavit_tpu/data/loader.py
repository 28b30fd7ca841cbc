"""Host batcher with device prefetch.

The reference's DataLoader (pin_memory / persistent_workers / prefetch,
HQAViT_CIFAR100.py:1312-1331) maps on TPU to: the whole (small) dataset
pinned in host RAM as one uint8 array, per-epoch shuffled index slicing,
and an async ``jax.device_put`` one batch ahead so the host-to-HBM copy
overlaps the previous step.  All augmentation happens on device
(qavit_tpu/data/augment.py).
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import jax
import numpy as np


def process_local_indices(batch_idx: np.ndarray, process_count: int,
                          process_index: int) -> np.ndarray:
    """This process's contiguous slice of a global batch's indices.

    Every host computes the SAME shuffled permutation (shared seed) and
    feeds only its 1/process_count share; the shares are reassembled into
    one global sharded array via
    ``jax.make_array_from_process_local_data``.
    """
    local = len(batch_idx) // process_count
    lo = process_index * local
    return batch_idx[lo:lo + local]


class BatchLoader:
    """Iterates (device uint8 images [B,H,W,3], device int32 labels).

    On a multi-host slice (``jax.process_count() > 1``) each process loads
    only its share of every global batch and the loader assembles the
    global jax.Array with ``make_array_from_process_local_data`` — the
    multi-host analogue of the single-process ``device_put``.
    """

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 batch_size: int, shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True,
                 sharding: Optional[jax.sharding.Sharding] = None,
                 process_count: Optional[int] = None,
                 process_index: Optional[int] = None):
        assert images.ndim == 4 and images.dtype == np.uint8
        self.images = images
        self.labels = labels.astype(np.int32)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.sharding = sharding
        self.process_count = (jax.process_count() if process_count is None
                              else process_count)
        self.process_index = (jax.process_index() if process_index is None
                              else process_index)
        if self.process_count > 1 and sharding is None:
            raise ValueError("multi-host loading requires a sharding")
        self._rng = np.random.RandomState(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.images)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _put(self, x, y):
        if self.process_count > 1:
            # x/y are this process's LOCAL share of the global batch
            gshape_x = (self.batch_size,) + x.shape[1:]
            gshape_y = (self.batch_size,) + y.shape[1:]
            return (jax.make_array_from_process_local_data(
                        self.sharding, x, gshape_x),
                    jax.make_array_from_process_local_data(
                        self.sharding, y, gshape_y))
        if self.sharding is not None:
            return (jax.device_put(x, self.sharding),
                    jax.device_put(y, self.sharding))
        return jax.device_put(x), jax.device_put(y)

    def __iter__(self) -> Iterator[Tuple[jax.Array, jax.Array]]:
        n = len(self.images)
        idx = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(idx)
        self._epoch += 1
        bs = self.batch_size
        num = len(self)

        # one-batch-ahead prefetch: device_put is async, so the H2D copy of
        # batch i+1 overlaps compute on batch i
        pending = None
        for i in range(num):
            sel = idx[i * bs:(i + 1) * bs]
            if self.process_count > 1:
                sel = process_local_indices(sel, self.process_count,
                                            self.process_index)
            nxt = self._put(self.images[sel], self.labels[sel])
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending


class IndexLoader:
    """Loader for the device-RESIDENT data path: the dataset was uploaded
    to HBM once, so each iteration yields only a device int32 index array
    [batch] (shuffled per epoch) — a few KB through the host link instead
    of the images themselves.  Single-host only (a sharded resident
    dataset belongs to the mesh input path)."""

    def __init__(self, n: int, batch_size: int, shuffle: bool = True,
                 seed: int = 0, drop_last: bool = True):
        self.n = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[np.ndarray]:
        idx = np.arange(self.n)
        if self.shuffle:
            self._rng.shuffle(idx)
        bs = self.batch_size
        for i in range(len(self)):
            yield idx[i * bs:(i + 1) * bs].astype(np.int32)

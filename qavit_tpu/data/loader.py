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


class BatchLoader:
    """Iterates (device uint8 images [B,H,W,3], device int32 labels)."""

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 batch_size: int, shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True,
                 sharding: Optional[jax.sharding.Sharding] = None):
        assert images.ndim == 4 and images.dtype == np.uint8
        self.images = images
        self.labels = labels.astype(np.int32)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.sharding = sharding
        self._rng = np.random.RandomState(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.images)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _put(self, x, y):
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
            nxt = self._put(self.images[sel], self.labels[sel])
            if pending is not None:
                yield pending
            pending = nxt
        if pending is not None:
            yield pending

"""ctypes wrapper + on-demand build for the native C++ batcher.

``NativeBatchLoader`` is a drop-in replacement for
:class:`qavit_tpu.data.loader.BatchLoader`: same iterator contract, but
shuffle + gather run on a C++ background thread into a preallocated ring,
overlapping host batch assembly with device compute.  Falls back cleanly
if the toolchain is unavailable (``is_available()``).
"""

from __future__ import annotations

import ctypes
import subprocess
import sys
from pathlib import Path
from typing import Iterator, Optional, Tuple

import numpy as np

_SRC = Path(__file__).parent / "batcher.cpp"
_LIB = Path(__file__).parent / "_batcher.so"
_lib = None


def _build() -> Optional[Path]:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             str(_SRC), "-o", str(_LIB)],
            check=True, capture_output=True)
        return _LIB
    except Exception as e:  # noqa: BLE001
        print(f"[native] batcher build failed: {e}", file=sys.stderr)
        return None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if _build() is None:
            return None
    lib = ctypes.CDLL(str(_LIB))
    lib.batcher_create.restype = ctypes.c_void_p
    lib.batcher_create.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_uint64, ctypes.c_int, ctypes.c_int64,
        ctypes.c_int]
    lib.batcher_num_batches.restype = ctypes.c_int64
    lib.batcher_num_batches.argtypes = [ctypes.c_void_p]
    lib.batcher_next.restype = ctypes.c_int64
    lib.batcher_next.argtypes = [ctypes.c_void_p]
    lib.batcher_slot_images.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.batcher_slot_images.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.batcher_slot_labels.restype = ctypes.POINTER(ctypes.c_int32)
    lib.batcher_slot_labels.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.batcher_slot_count.restype = ctypes.c_int64
    lib.batcher_slot_count.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.batcher_release.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.batcher_start_epoch.argtypes = [ctypes.c_void_p]
    lib.batcher_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def is_available() -> bool:
    return _load() is not None


class NativeBatchLoader:
    """Iterates (device uint8 images [B,H,W,3], device int32 labels)."""

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 batch_size: int, shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True, queue_depth: int = 4,
                 sharding=None):
        lib = _load()
        if lib is None:
            raise RuntimeError("native batcher unavailable")
        assert images.ndim == 4 and images.dtype == np.uint8
        self._lib = lib
        # keep references so the C++ side's pointers stay valid
        self._images = np.ascontiguousarray(images)
        self._labels = np.ascontiguousarray(labels.astype(np.int32))
        self.batch_size = batch_size
        self.item_shape = images.shape[1:]
        self.item_bytes = int(np.prod(self.item_shape))
        self.sharding = sharding
        self._first_epoch = True
        self._handle = lib.batcher_create(
            self._images.ctypes.data_as(ctypes.c_void_p),
            self._labels.ctypes.data_as(ctypes.c_void_p),
            len(images), self.item_bytes, batch_size, seed,
            int(drop_last), queue_depth, int(shuffle))
        self._num = lib.batcher_num_batches(self._handle)

    def __len__(self) -> int:
        return int(self._num)

    def __iter__(self) -> Iterator[Tuple[object, object]]:
        import jax

        if not self._first_epoch:
            self._lib.batcher_start_epoch(self._handle)
        self._first_epoch = False
        lib, h = self._lib, self._handle
        for _ in range(self._num):
            slot = lib.batcher_next(h)
            if slot < 0:
                break
            count = lib.batcher_slot_count(h, slot)
            img_ptr = lib.batcher_slot_images(h, slot)
            lbl_ptr = lib.batcher_slot_labels(h, slot)
            imgs = np.ctypeslib.as_array(
                img_ptr, shape=(count,) + self.item_shape)
            lbls = np.ctypeslib.as_array(lbl_ptr, shape=(count,))
            if self.sharding is not None:
                x = jax.device_put(imgs, self.sharding)
                y = jax.device_put(lbls, self.sharding)
            else:
                x = jax.device_put(imgs)
                y = jax.device_put(lbls)
            # device_put copies asynchronously but reads the host buffer
            # synchronously enough for slot reuse only after the copy; be
            # conservative and materialise before releasing the slot
            x.block_until_ready()
            lib.batcher_release(h, slot)
            yield x, y

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.batcher_destroy(self._handle)
                self._handle = None
        except Exception:  # noqa: BLE001
            pass

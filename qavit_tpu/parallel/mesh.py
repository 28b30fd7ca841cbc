"""Device mesh construction and sharding helpers.

The reference is single-GPU (SURVEY.md §2.10) — parallelism here is
greenfield, built the TPU way: a ``jax.sharding.Mesh`` over ICI with a
``data`` axis (and a reserved ``model`` axis for tensor-parallel
extensions), NamedShardings for batch/replicated placement, and
``jax.distributed`` initialisation for multi-host slices.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed() -> None:
    """Initialise multi-host JAX if running under a multi-process launcher
    (no-op on a single host)."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Axis order puts ``model`` innermost so tensor-parallel collectives ride
    the fastest ICI links; ``data`` spans the rest.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays) -> Tuple[jax.Array, ...]:
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]

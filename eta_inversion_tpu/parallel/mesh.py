"""Device mesh construction.

The reference's only parallelism is a process-per-experiment pool pinned via
CUDA_VISIBLE_DEVICES (/root/reference/utils/device_pool.py:10-61).  The
TPU-native replacement is single-program batched execution over a
`jax.sharding.Mesh`: the batch of dataset samples is sharded over the "data"
axis (ICI), and optionally the model's attention/MLP parameter matrices over a
"model" axis (tensor parallelism; XLA inserts the all-reduces).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, model_parallel: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create a (data, model) mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"make_mesh: requested {n_devices} devices but only "
                f"{len(devices)} available ({devices[0].platform!r} platform)")
        devices = devices[:n_devices]
    n = len(devices)
    if n == 0:
        raise ValueError("make_mesh: no JAX devices available")
    if n % model_parallel != 0:
        raise ValueError(
            f"make_mesh: {n} available device(s) not divisible by "
            f"model_parallel={model_parallel}"
            + (f" (requested n_devices={n_devices})" if n_devices else ""))
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for NHWC tensors."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

"""Device mesh construction + sharding helpers.

The reference is single-process/single-GPU (SURVEY §2.2); its only
"distribution" is a mutex around one CUDA context. Here the scaling axes
are explicit jax meshes:

- ``data`` — frames/windows/sequences (embarrassingly parallel SLAM work:
  batched extraction, multi-window BA, multi-sequence mapping);
- ``model`` — reserved for sharding attention heads / Sinkhorn columns of
  the matcher when keypoint counts grow.

On a multi-host pod slice the same axis names span all hosts; collectives
ride ICI within a slice and DCN across (XLA picks the transport from the
mesh topology).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "P"]


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, ("data", "model"))


def data_sharding(mesh: Mesh, *rest) -> NamedSharding:
    """Shard the leading axis over ``data``; trailing axes as given."""
    return NamedSharding(mesh, P("data", *rest))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

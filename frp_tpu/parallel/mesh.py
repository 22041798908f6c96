"""Device-mesh construction and sharding helpers.

The reference's only scale-out mechanisms are Python thread pools and
HTTP/JSON (SURVEY.md section 2.2/2.4). Here the one real parallel dimension —
the [streams x frames] batch — is sharded over a ``jax.sharding.Mesh`` 'data'
axis; a second 'model' axis carries the tensor-parallel ArcFace classifier in
frp_tpu.train. Collectives ride ICI via XLA (psum/all-gather inserted by the
partitioner), never host Python.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int | None = None, n_model: int = 1, devices=None
) -> Mesh:
    """Build a (data, model) mesh over the available devices.

    Defaults: all devices on the data axis, model axis 1. The mesh works
    identically on one real TPU chip, a v5e-4 slice, or an
    xla_force_host_platform_device_count CPU fleet.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = n_data * n_model
    grid = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, rank: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'; other axes replicated."""
    spec = P(DATA_AXIS, *([None] * (rank - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def model_sharding(mesh: Mesh, axis: int, rank: int) -> NamedSharding:
    """Shard one axis of a tensor over 'model' (e.g. ArcFace class matrix)."""
    spec = [None] * rank
    spec[axis] = MODEL_AXIS
    return NamedSharding(mesh, P(*spec))

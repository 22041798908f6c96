"""Device-mesh construction and sharding helpers.

The reference's only scale-out mechanisms are Python thread pools and
HTTP/JSON (SURVEY.md section 2.2/2.4). Here the one real parallel dimension —
the [streams x frames] batch — is sharded over a ``jax.sharding.Mesh`` 'data'
axis; a second 'model' axis carries the tensor-parallel ArcFace classifier in
frp_tpu.train. Collectives ride ICI via XLA (psum/all-gather inserted by the
partitioner), never host Python.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


# ---------------------------------------------------------------------------
# multi-host (DCN) bring-up — SURVEY.md section 2.4
# ---------------------------------------------------------------------------
# The reference's cross-machine fabric is HTTP/JSON between FL clients
# (reference federated.py:150-265). The TPU-native equivalent inside a pod
# is jax.distributed: every host calls initialize(), jax.devices() becomes
# the GLOBAL device list, and the same Mesh/pjit code then rides ICI within
# a slice and DCN across hosts — no NCCL/MPI translation layer.

def distributed_initialize(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Initialize jax.distributed from args or env, idempotently.

    Env contract (flag-compatible with standard JAX launchers):
      FRP_COORDINATOR   "host:port" of process 0 (JAX_COORDINATOR_ADDRESS
                        also honored)
      FRP_NUM_PROCESSES / FRP_PROCESS_ID (JAX_NUM_PROCESSES/JAX_PROCESS_ID
                        also honored)
    On TPU pods all three are auto-detected by JAX; passing nothing there is
    correct. Returns {enabled, process_id, num_processes, local_devices,
    global_devices}. A single-process setup (no coordinator configured)
    returns enabled=False without touching jax.distributed.
    """
    coordinator = coordinator or os.getenv("FRP_COORDINATOR") or os.getenv(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None:
        raw = os.getenv("FRP_NUM_PROCESSES") or os.getenv("JAX_NUM_PROCESSES")
        num_processes = int(raw) if raw else None
    if process_id is None:
        raw = os.getenv("FRP_PROCESS_ID") or os.getenv("JAX_PROCESS_ID")
        process_id = int(raw) if raw else None

    try:
        already = bool(jax.distributed.is_initialized())
    except AttributeError:  # very old jax
        already = False
    if coordinator is None and not already:
        # do NOT touch jax.devices() here: it initializes the XLA backend,
        # which both forecloses a later real distributed init in this
        # process AND grabs the TPU chip (gotcha 2) just for a probe
        return {"enabled": False, "process_id": 0, "num_processes": 1,
                "local_devices": None, "global_devices": None}
    if not already:
        # bounded bring-up: a typo'd coordinator address must fail loudly
        # in ~FRP_DIST_TIMEOUT seconds, not hang for JAX's default 300 s
        # (observed live: a dead port blocks initialize() indefinitely)
        timeout = int(os.getenv("FRP_DIST_TIMEOUT", "60"))
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
            initialization_timeout=timeout,
        )
    return {
        "enabled": True,
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def make_global_mesh(n_model: int = 1) -> Mesh:
    """Multi-host mesh: GLOBAL device grid laid out so the 'model' axis
    stays within a host (TP collectives ride ICI; only the 'data' axis —
    gradient/FedAvg psums — crosses DCN). Call distributed_initialize()
    first on every process."""
    devices = np.asarray(jax.devices())  # global list, process-major order
    per_host = max(1, len(jax.local_devices()))
    # the host-straddle guard assumes a homogeneous fleet: verify every
    # process contributes the same device count, or the process-major
    # reshape silently pairs devices from different hosts on the TP axis
    from collections import Counter

    by_proc = Counter(d.process_index for d in devices.tolist())
    if len(set(by_proc.values())) > 1:
        raise ValueError(
            f"heterogeneous device counts per process {dict(by_proc)}: "
            "the (data, model) reshape would straddle hosts"
        )
    if n_model > per_host or per_host % n_model:
        raise ValueError(
            f"model axis {n_model} must divide local device count {per_host} "
            "(TP must not cross hosts: ICI >> DCN bandwidth)"
        )
    n_data = len(devices) // n_model
    grid = devices.reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


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

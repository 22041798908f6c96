"""Mesh construction, sharding helpers, and sharded FedAvg collectives."""

from frp_tpu.parallel.fedavg import fedavg_sharded, pad_clients
from frp_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    data_sharding,
    distributed_initialize,
    make_global_mesh,
    make_mesh,
    model_sharding,
    replicated,
)

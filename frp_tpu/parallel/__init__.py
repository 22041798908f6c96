"""Mesh construction, sharding helpers, and sharded FedAvg collectives."""

from frp_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from frp_tpu.parallel.fedavg import fedavg_sharded

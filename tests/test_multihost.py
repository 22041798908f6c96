"""Multi-host (DCN) path: jax.distributed bring-up + global-mesh collectives
across two REAL processes on the CPU backend (SURVEY.md section 2.4 — the
reference's FL clients talk JSON-over-HTTP; ours ride jax.distributed).
Each test spawns two subprocesses that must agree on a cross-process
reduction over a global mesh."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, %r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from frp_tpu.parallel.mesh import distributed_initialize, make_global_mesh

    info = distributed_initialize()
    assert info["enabled"] and info["num_processes"] == 2, info
    assert info["global_devices"] == 4, info
    mesh = make_global_mesh(n_model=2)  # model axis stays host-local
    assert dict(mesh.shape) == {"data": 2, "model": 2}, mesh.shape

    # cross-process FedAvg: each process contributes one client update along
    # the global 'data' axis; the weighted mean must see BOTH processes
    pid = jax.process_index()
    local = np.full((1, 4), float(pid + 1), np.float32)  # client pid: all (pid+1)s
    sharding = NamedSharding(mesh, P("data", None))
    stacked = jax.make_array_from_process_local_data(sharding, local, (2, 4))

    @jax.jit
    def fedavg(x):
        return jnp.mean(x, axis=0)

    out = np.asarray(jax.device_get(fedavg(stacked)))
    np.testing.assert_allclose(out, 1.5)  # (1 + 2) / 2 across processes
    print(f"OK proc={pid} fedavg={out.tolist()}")
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh_fedavg(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER % REPO)
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            FRP_COORDINATOR=f"localhost:{port}",
            FRP_NUM_PROCESSES="2",
            FRP_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=200)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-2000:]}"
        assert f"OK proc={pid}" in out, out[-2000:]


def test_single_process_initialize_is_noop():
    """Without a coordinator configured, distributed_initialize must not
    touch jax.distributed (the common single-host serving case)."""
    from frp_tpu.parallel.mesh import distributed_initialize

    saved = {
        k: os.environ.pop(k, None)
        for k in ("FRP_COORDINATOR", "JAX_COORDINATOR_ADDRESS",
                  "FRP_NUM_PROCESSES", "FRP_PROCESS_ID")
    }
    try:
        info = distributed_initialize()
        assert info["enabled"] is False
        assert info["num_processes"] == 1
    finally:
        for k, v in saved.items():
            if v is not None:
                os.environ[k] = v


def test_global_mesh_rejects_cross_host_model_axis():
    import jax

    from frp_tpu.parallel.mesh import make_global_mesh

    n_local = len(jax.local_devices())
    with pytest.raises(ValueError, match="must divide local device count"):
        make_global_mesh(n_model=n_local * 2)

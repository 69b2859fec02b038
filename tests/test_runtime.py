"""Multi-host runtime helpers (parallel/runtime.py).

Single-process semantics are what CI can exercise directly: init is a
no-op, the global mesh covers the 8 virtual devices, process_slice
partitions exactly, and host_local_to_global produces arrays sharded over
the mesh that sharded programs consume unchanged.  The multi-process
wiring delegates to jax.distributed (SLURM/TPU-pod autodetection), which
owns that contract.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from bayesian_ode_tpu.parallel import (
    Runtime,
    coordinator_only,
    global_mesh,
    host_local_to_global,
    init_runtime,
    process_slice,
)


def test_init_runtime_single_process_noop():
    rt = init_runtime()
    assert rt.process_index == 0 and rt.process_count == 1
    assert rt.n_global_devices == len(jax.devices())
    assert rt.is_coordinator
    # Repeat calls are safe and stable.
    assert init_runtime() == rt


def test_global_mesh_covers_all_devices():
    mesh = global_mesh(axis="chain")
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("chain",)


@pytest.mark.parametrize("n_total,P_", [(81, 4), (8, 8), (7, 3), (5, 8)])
def test_process_slice_partitions_exactly(n_total, P_):
    covered = []
    for p in range(P_):
        rt = Runtime(p, P_, 1, P_)
        s = process_slice(n_total, rt)
        covered.extend(range(n_total)[s])
    assert covered == list(range(n_total))
    sizes = [len(range(n_total)[process_slice(n_total, Runtime(p, P_, 1, P_))])
             for p in range(P_)]
    assert max(sizes) - min(sizes) <= 1


def test_host_local_to_global_feeds_sharded_compute():
    mesh = global_mesh(axis="chain")
    n = mesh.devices.size * 3
    tree = {"U": np.arange(n * 2, dtype=np.float32).reshape(n, 2),
            "logsn": np.arange(n, dtype=np.float32)}
    g = host_local_to_global(tree, mesh, axis="chain")
    assert g["U"].sharding == NamedSharding(mesh, P("chain", None))
    assert g["logsn"].sharding == NamedSharding(mesh, P("chain"))
    out = jax.jit(lambda t: t["U"].sum(1) + t["logsn"])(g)
    np.testing.assert_allclose(
        np.asarray(out), tree["U"].sum(1) + tree["logsn"], rtol=1e-6)


def test_coordinator_only_runs_on_process_zero():
    hits = []
    assert coordinator_only(lambda: hits.append(1) or "done") == "done"
    assert hits == [1]


def test_process_slice_default_runtime_single_process():
    assert process_slice(10) == slice(0, 10)


def test_cluster_env_detection(monkeypatch):
    from bayesian_ode_tpu.parallel import runtime as rt

    for var in ("SLURM_NTASKS", "TPU_WORKER_HOSTNAMES",
                "MEGASCALE_COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert not rt._cluster_env_present()
    # Single-worker TPU tunnel value must NOT look like a fleet.
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert not rt._cluster_env_present()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1,host2,host3")
    assert rt._cluster_env_present()
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES")
    monkeypatch.setenv("SLURM_NTASKS", "4")
    assert rt._cluster_env_present()
    monkeypatch.setenv("SLURM_NTASKS", "1")
    assert not rt._cluster_env_present()
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:8476")
    assert rt._cluster_env_present()

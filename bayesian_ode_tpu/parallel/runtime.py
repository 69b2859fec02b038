"""Multi-host runtime: `jax.distributed` init + global mesh + host-local IO.

The reference scales out with SLURM job arrays of fully independent
processes (zero inter-job communication; /root/reference/scripts/vanderpol/
vanderpol_gp.slrm `--array=1-81`, gp.py:563-564's `Pool.starmap`).  The
TPU-native replacement (SURVEY.md §2.9) is ONE SPMD program over a pod
slice: every host runs the same script, `jax.distributed.initialize` wires
the processes into a single runtime, and a named `Mesh` over
`jax.devices()` (all chips, all hosts) carries the chain/particle axes so
XLA collectives ride ICI instead of files-on-a-filesystem.

Single-host use (including this repo's CI on one chip / 8 virtual CPU
devices) needs no initialization: `init_runtime()` is a no-op there, and
every helper below degrades to the local-mesh behavior.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class Runtime:
    """What a launched process knows about the fleet it belongs to."""

    process_index: int
    process_count: int
    n_local_devices: int
    n_global_devices: int

    @property
    def is_coordinator(self) -> bool:
        return self.process_index == 0


def init_runtime(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> Runtime:
    """Initialize the multi-host runtime; return what this process knows.

    - On TPU pods (and GKE/GCE metadata environments) `jax.distributed.
      initialize()` autodetects everything — call with no args.
    - Under SLURM, pass nothing either: JAX's cluster detection reads
      SLURM_* env vars.  Explicit args override autodetection (useful for
      bare-metal rings: coordinator "host0:1234", num_processes, id).
    - Single process (no coordinator discoverable, no args): no-op.

    Safe to call more than once; repeat calls return the current state
    without re-initializing (jax.distributed raises on double init).
    """
    want_multi = (
        coordinator_address is not None
        or num_processes is not None
        or _cluster_env_present()
    )
    if want_multi and not _backend_initialized():
        kwargs = {}
        if coordinator_address is not None:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError as e:  # pragma: no cover - double-init race
            # jax 0.9 raises "distributed.initialize should only be
            # called once."; older versions said "already initialized"
            msg = str(e).lower()
            if "once" not in msg and "already" not in msg:
                raise
    elif want_multi and jax.process_count() == 1:  # pragma: no cover
        import warnings

        warnings.warn(
            "init_runtime: a multi-process launcher environment was "
            "detected but the XLA backend is already initialized "
            "single-process; call init_runtime() before any other JAX use",
            stacklevel=2,
        )
    return Runtime(
        process_index=jax.process_index(),
        process_count=jax.process_count(),
        n_local_devices=jax.local_device_count(),
        n_global_devices=jax.device_count(),
    )


def _cluster_env_present() -> bool:
    """True when a known launcher's env advertises a MULTI-process fleet.

    Single-worker values must not trigger (e.g. this machine's TPU tunnel
    exports TPU_WORKER_HOSTNAMES=localhost for its one worker)."""
    if int(os.environ.get("SLURM_NTASKS", "1")) > 1:
        return True
    # TPU pod slices: comma-separated worker list on every host of a
    # multi-host slice; one entry means one host.
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h.strip()]) > 1:
        return True
    for var in ("MEGASCALE_COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS"):
        if os.environ.get(var, ""):
            return True
    return False


def _backend_initialized() -> bool:
    try:
        from jax._src import xla_bridge

        return bool(xla_bridge._backends)
    except Exception:  # pragma: no cover - internal layout moved
        return True


def global_mesh(axis: str = "chain", devices: Optional[Sequence] = None) -> Mesh:
    """1-D mesh over ALL global devices (every chip on every host).

    Unlike `make_mesh` (local jax.devices(), fine single-host) this is the
    mesh multi-host programs must use: jax.devices() already returns the
    global list once init_runtime() ran, and shardings over it make pjit
    insert ICI collectives across hosts.
    """
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis,))


def process_slice(n_total: int, runtime: Optional[Runtime] = None) -> slice:
    """This process's contiguous block of `n_total` work items.

    The multi-host analogue of the reference's `--array=1-81` task-id math
    (vanderpol_gp.slrm): item i belongs to process i * P // n_total.  Block
    sizes differ by at most one; every item is owned by exactly one
    process.
    """
    if runtime is None:
        runtime = Runtime(jax.process_index(), jax.process_count(),
                          jax.local_device_count(), jax.device_count())
    p, P_ = runtime.process_index, runtime.process_count
    lo = p * n_total // P_
    hi = (p + 1) * n_total // P_
    return slice(lo, hi)


def host_local_to_global(tree, mesh: Mesh, axis: str = "chain"):
    """Assemble per-host shards into global arrays sharded over `axis`.

    Each process passes ITS OWN slice of the leading dimension (e.g. the
    chains it initialized from its `process_slice`); the result is a
    global jax.Array of the concatenated leading dim, sharded over the
    mesh axis, ready for `shard_map`/pjit.  On a single-host mesh this is
    equivalent to `shard_leading_axis`.
    """
    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1)))
        if jax.process_count() == 1:
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x)
        )

    return jax.tree.map(put, tree)


def coordinator_only(fn):
    """Run `fn()` on process 0 only (logging, checkpoint writes, plots);
    other processes get None.  The reference never needs this (independent
    processes each own their run dir); one SPMD program does."""
    if jax.process_index() == 0:
        return fn()
    return None

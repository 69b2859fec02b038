"""Two-process `jax.distributed` CPU integration test (VERDICT r4 #5).

`parallel/runtime.py` claims to replace the reference's SLURM fan-out
(/root/reference/scripts/triton/vanderpol_gp.slrm:1-12) with one SPMD
program; until this test nothing actually ran `jax.distributed.
initialize` with >1 process — autodetect was unit-tested and the
collective paths only ran on single-process virtual-device meshes.  Here
a real 2-process fleet (localhost coordinator, 4 virtual CPU devices per
process = 8 global) runs `init_runtime` -> `global_mesh` ->
`host_local_to_global` -> one sharded-batched SGLD sampling run and one
sharded-SMC run, and the assembled results are compared against the
identical single-process 8-device computation.

Worker subprocesses strip the `.axon_site` sitecustomize from PYTHONPATH
(CLAUDE.md gotcha: it would hang claiming the TPU the parent's
environment points at) and force the CPU platform.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import json, os, sys
import numpy as np

idx = int(sys.argv[1])
nproc = int(sys.argv[2])
coord = sys.argv[3]
out_path = sys.argv[4]

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from bayesian_ode_tpu import samplers
from bayesian_ode_tpu.parallel import (
    runtime as rt,
    sample_chain_sharded_batched,
    smc_sharded,
)

if nproc > 1:
    r = rt.init_runtime(coordinator_address=coord, num_processes=nproc,
                        process_id=idx)
else:
    r = rt.init_runtime()
assert r.process_count == nproc, r
assert r.n_global_devices == 8, r
mesh = rt.global_mesh("chain")

# ---- deterministic global problem, host-local construction ----
C, D = 32, 3
pos_full = np.linspace(-1.0, 1.0, C * D, dtype=np.float32).reshape(C, D)
sl = rt.process_slice(C, r)
pos = rt.host_local_to_global(pos_full[sl], mesh, "chain")

pot = lambda q: 0.5 * jnp.sum(q * q, axis=-1)
kernel = samplers.sgld_batched(pot, 1e-2)
positions, potentials = sample_chain_sharded_batched(
    kernel, pos, jax.random.PRNGKey(0), num_samples=5, mesh=mesh,
    burn_in=2)

# ---- sharded SMC (particle axis over the same global mesh) ----
pmesh = rt.global_mesh("particle")
prior_full = np.asarray(
    jax.random.normal(jax.random.PRNGKey(7), (C, D))).astype(np.float32)
prior = rt.host_local_to_global(prior_full[sl], pmesh, "particle")
log_lik = lambda q: -2.0 * jnp.sum((q - 0.5) ** 2, axis=-1)
log_prior = lambda q: -0.5 * jnp.sum(q * q, axis=-1)
res = smc_sharded(jax.random.PRNGKey(1), log_lik, log_prior, prior,
                  pmesh, num_moves=2, max_stages=20)

# ---- dump: local shards (with global indices) + replicated scalars ----
blob = {"log_z": float(res.log_z), "num_stages": int(res.num_stages),
        "process_count": int(r.process_count)}
arrs = {}


def dump(name, garr, axis):
    for j, sh in enumerate(garr.addressable_shards):
        lo = sh.index[axis].start or 0
        arrs[f"{name}_{idx}_{j}"] = np.asarray(sh.data)
        blob.setdefault(name, []).append([j, int(lo)])


dump("positions", positions, 1)
dump("potentials", potentials, 1)
dump("particles", res.particles, 0)
np.savez(out_path + f".{idx}.npz", **arrs)
with open(out_path + f".{idx}.json", "w") as f:
    json.dump(blob, f)
print("worker", idx, "ok", flush=True)
"""


def _worker_env(n_local):
    env = dict(os.environ)
    env["PYTHONPATH"] = ":".join(
        p for p in ([_REPO] + env.get("PYTHONPATH", "").split(":"))
        if p and ".axon_site" not in p)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    # keep the compile cache out of the way of concurrent writers
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    return env


def _run_fleet(tmp_path, nproc, n_local, tag):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    out = str(tmp_path / f"out_{tag}")
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), str(nproc),
             f"127.0.0.1:{port}", out],
            env=_worker_env(n_local), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            o, _ = p.communicate(timeout=600)
            outs.append(o)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, o in zip(procs, outs):
        assert p.returncode == 0, o[-4000:]
    return out


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _assemble(out, nproc, name, axis, shape):
    full = np.full(shape, np.nan, np.float32)
    for i in range(nproc):
        with open(out + f".{i}.json") as f:
            blob = json.load(f)
        npz = np.load(out + f".{i}.npz")
        for j, lo in blob[name]:
            data = npz[f"{name}_{i}_{j}"]
            sl = [slice(None)] * len(shape)
            sl[axis] = slice(lo, lo + data.shape[axis])
            full[tuple(sl)] = data
    assert not np.isnan(full).any(), f"{name}: unfilled shards"
    return full


@pytest.mark.slow
def test_two_process_distributed_matches_single_process(tmp_path):
    C, D, S = 32, 3, 5
    single = _run_fleet(tmp_path, 1, 8, "single")
    multi = _run_fleet(tmp_path, 2, 4, "multi")

    # collective-free sharded SGLD: per-device PRNG folds depend only on
    # the 8-device global mesh, identical in both launches -> exact
    for name, shape, axis in (("positions", (S, C, D), 1),
                              ("potentials", (S, C), 1)):
        a = _assemble(single, 1, name, axis, shape)
        b = _assemble(multi, 2, name, axis, shape)
        np.testing.assert_array_equal(a, b, err_msg=name)

    # sharded SMC: global-index per-particle PRNG makes the move kernels
    # identical; the psum'd stage scalars may differ in f32 reduction
    # order between the 1x8 and 2x4 device layouts, so compare to
    # tolerance rather than bitwise
    pa = _assemble(single, 1, "particles", 0, (C, D))
    pb = _assemble(multi, 2, "particles", 0, (C, D))
    np.testing.assert_allclose(pa, pb, rtol=1e-4, atol=1e-5)
    with open(single + ".0.json") as f:
        ja = json.load(f)
    with open(multi + ".0.json") as f:
        jb = json.load(f)
    assert jb["process_count"] == 2 and ja["process_count"] == 1
    assert ja["num_stages"] == jb["num_stages"]
    np.testing.assert_allclose(ja["log_z"], jb["log_z"], rtol=1e-4)

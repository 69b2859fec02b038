"""Persistent XLA compilation cache.

The fused Pallas trajectory kernels (ops/gp_rk4.py, ops/mlp_rk4.py,
ops/gp_dopri5.py) take minutes of Mosaic compile time at first use on a
TPU — longer than many short sampling runs.  The reference has no
analogue (PyTorch eager has no compile step); for this framework the
compile cost is real and the fix is JAX's persistent compilation cache,
which keys executables by (HLO, compiler flags, jaxlib version, backend)
and makes every process after the first load the binary from disk in
milliseconds.

Call `enable_persistent_cache()` once per process, before the first jit
execution.  Entry points (bench.py, experiments/run.py, examples/) do
this by default; opt out with BODE_NO_COMPILE_CACHE=1 or a custom
location via BODE_COMPILE_CACHE_DIR.
"""
from __future__ import annotations

import hashlib
import os
import platform

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "bayesian_ode_tpu", "xla_cache"
)

_enabled_path: str | None = None


def _host_fingerprint() -> str:
    """Short hash of the host CPU's feature set.

    JAX's cache key covers (HLO, flags, jaxlib, backend) but NOT the
    host microarchitecture — and XLA:CPU AOT executables are compiled
    for the build host's exact feature flags.  This container migrates
    across heterogeneous hosts (observed 2026-08-21: 'Compile machine
    features ... doesn't match the machine type for execution ... could
    lead to execution errors such as SIGILL', then a real segfault in
    compilation_cache.get_executable_and_time mid-CI).  Partitioning the
    cache directory by a CPU-flags fingerprint makes a migrated process
    start a fresh subcache instead of loading incompatible binaries.
    """
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
            else:
                feats = platform.machine()
    except OSError:
        feats = platform.machine()
    return hashlib.sha1(feats.encode()).hexdigest()[:12]


def enable_persistent_cache(path: str | None = None,
                            min_compile_time_secs: float = 1.0) -> str | None:
    """Point JAX's compilation cache at a persistent on-disk directory.

    Only executables whose compile took >= `min_compile_time_secs` are
    written (the default keeps tiny jits out of the cache; the fused
    trajectory kernels are minutes).  Returns the cache dir actually in
    effect, or None if disabled via BODE_NO_COMPILE_CACHE=1.  Safe to
    call more than once; a repeat call with a DIFFERENT path re-points
    the jax config so the returned path is always where the cache lives.
    """
    global _enabled_path
    if os.environ.get("BODE_NO_COMPILE_CACHE") == "1":
        return None
    path = path or os.environ.get("BODE_COMPILE_CACHE_DIR") or _DEFAULT_DIR
    # per-host-microarchitecture subdirectory (see _host_fingerprint)
    path = os.path.join(path, _host_fingerprint())
    if _enabled_path == path:
        return path

    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_time_secs)
    _enabled_path = path
    return path

"""Test configuration: CPU backend with 8 virtual devices and float64.

The accuracy gates (rel error < 1e-4 vs closed forms, gradient checks at
rtol 1e-7/atol 1e-9, adjoint-vs-direct consistency) mirror the reference's
float64 test pins (neuralode_tests/odeint_tests.py:9) and require x64, which
the TPU does not execute natively — so correctness CI runs on the CPU
backend (same XLA program structure) while TPU runs the throughput configs.
Sharding tests use the 8 virtual CPU devices.

Note: this environment's sitecustomize registers a TPU backend at
interpreter start, so the platform must be forced via jax.config (the
JAX_PLATFORMS env var alone is overridden); XLA_FLAGS still applies because
the CPU client initializes lazily.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache (keyed by HLO, so safe across code edits): the
# slow suites (test_sharding, fused-kernel interpret-mode compiles) are
# compile-dominated and repeat across CI runs.
from bayesian_ode_tpu.utils import enable_persistent_cache  # noqa: E402

enable_persistent_cache(min_compile_time_secs=2.0)

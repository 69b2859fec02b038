"""Utility-layer gates: meters, profiling, logging."""
import json
import os

import jax
import jax.numpy as jnp

from bayesian_ode_tpu.utils.logging import RunLogger
from bayesian_ode_tpu.utils.meters import RunningAverageMeter
from bayesian_ode_tpu.utils.profiling import device_timer, time_compiled


def test_running_average_meter():
    m = RunningAverageMeter(momentum=0.5)
    m.update(2.0)
    assert m.avg == 2.0
    m.update(4.0)
    assert abs(m.avg - 3.0) < 1e-12
    m.reset()
    assert m.val is None and m.avg == 0.0


def test_device_timer_and_time_compiled():
    x = jnp.ones((64, 64))
    with device_timer("t", sync_tree=x, echo=False) as r:
        y = (x @ x).block_until_ready()
    assert r["seconds"] > 0

    fn = jax.jit(lambda a: a @ a)
    compile_s, steady_s = time_compiled(fn, x, iters=3)
    assert compile_s > 0 and steady_s >= 0


def test_run_logger(tmp_path):
    path = str(tmp_path / "log.jsonl")
    with RunLogger(path) as log:
        log.log({"event": "a", "x": 1.5})
        log.log({"event": "b", "arr": jnp.asarray([1.0, 2.0])})
    lines = open(path).read().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[1])
    assert rec["event"] == "b" and rec["arr"] == [1.0, 2.0]


def test_enable_persistent_cache(tmp_path, monkeypatch):
    import bayesian_ode_tpu.utils.compile_cache as cc

    prev = jax.config.jax_compilation_cache_dir
    monkeypatch.setattr(cc, "_enabled_path", None)
    cache_dir = str(tmp_path / "xla_cache")
    # the cache lives in a per-host-microarchitecture subdirectory (r5:
    # XLA:CPU AOT entries compiled on another host can SIGILL at load
    # after a container migration)
    fp_dir = os.path.join(cache_dir, cc._host_fingerprint())
    try:
        assert cc.enable_persistent_cache(cache_dir) == fp_dir
        assert os.path.isdir(fp_dir)
        assert jax.config.jax_compilation_cache_dir == fp_dir
        # Idempotent; and the kill switch wins over any path.
        assert cc.enable_persistent_cache(cache_dir) == fp_dir
        # A repeat call with a DIFFERENT path must re-point the config so
        # the returned path is where the cache actually lives (ADVICE r1).
        cache_dir2 = str(tmp_path / "xla_cache2")
        fp_dir2 = os.path.join(cache_dir2, cc._host_fingerprint())
        assert cc.enable_persistent_cache(cache_dir2) == fp_dir2
        assert jax.config.jax_compilation_cache_dir == fp_dir2
        monkeypatch.setattr(cc, "_enabled_path", None)
        monkeypatch.setenv("BODE_NO_COMPILE_CACHE", "1")
        assert cc.enable_persistent_cache(cache_dir) is None
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)

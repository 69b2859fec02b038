"""One-off measurement: fused FHN parameter-inference posterior
(ops/fhn_dopri5) vs the generic vmapped bounded-backprop path.

Protocol mirrors bench.py's sustained fused-training phases: jit an
n_steps pSGLD segment (each step = fused potential fwd+bwd at adaptive
dopri5 rtol=1e-7), queue several launches per sync, best-of-3 — the axon
tunnel charges a variable ~20-30 ms per host sync that would otherwise
swamp the kernel.  Run on the chip:

    PYTHONPATH=/root/repo:$PYTHONPATH python scripts/bench_fhn_fused.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from bayesian_ode_tpu import odeint, samplers
from bayesian_ode_tpu.ops.fhn_dopri5 import (
    fhn_dopri5_solve_stats,
    fhn_vector_field,
    make_fused_fhn_potential_dopri5,
)
from bayesian_ode_tpu.utils import enable_persistent_cache

C = 10_112
# unlike the spiral field (H=50 stage buffers blow HBM at 10k chains),
# the 3-parameter FHN state is tiny — the generic path runs at the SAME
# chain count, so the ratio is honest per-chain and per-launch
C_GEN = C
T = 16
NOISE = 0.05
RTOL, ATOL = 1e-7, 1e-9
N_STEPS = 200
LAUNCHES = 4
REPEATS = 3
TRUTH = {"a": 0.2, "b": 0.2, "c": 3.0}


def theta0(n):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return {
        name: (TRUTH[name] + 0.05 * jax.random.normal(k, (n,))).astype(
            jnp.float32)
        for name, k in zip(("a", "b", "c"), ks)
    }


def sustained(run, state):
    best = float("inf")
    for r in range(REPEATS):
        t0 = time.perf_counter()
        s = state
        for i in range(LAUNCHES):
            s = run(s, jax.random.PRNGKey(16 + r * LAUNCHES + i))
        jax.block_until_ready(jax.tree.leaves(s)[0])
        best = min(best, time.perf_counter() - t0)
    return LAUNCHES * N_STEPS / best


def main():
    enable_persistent_cache()
    f32 = jnp.float32
    x0 = jnp.asarray([[-1.0, 1.0]], f32)
    ts = jnp.linspace(0.0, 5.0, T).astype(f32)
    f_true = lambda tt, X: fhn_vector_field(TRUTH, tt, X)  # noqa: E731
    clean = odeint(f_true, x0, ts, method="dopri5", rtol=1e-9, atol=1e-11)
    Y = np.transpose(np.asarray(clean), (1, 0, 2)) + NOISE * np.asarray(
        jax.random.normal(jax.random.PRNGKey(7), (1, T, 2)))
    Y = Y.astype(np.float32)

    # store_steps budget: worst chain accepted+rejected must fit
    _, stats = fhn_dopri5_solve_stats(theta0(256), x0, ts, rtol=RTOL,
                                      atol=ATOL, interpret=False)
    worst = int(jnp.max(stats["n_accepted"] + stats["n_rejected"]))
    iters = int(jnp.max(stats["n_iterations"]))
    nfe = float(jnp.mean(stats["nfe"]))
    store = 128 if worst <= 128 else 256
    print(f"budget probe: worst acc+rej {worst}, lockstep iters {iters}, "
          f"mean NFE {nfe:.1f} -> store_steps {store}", flush=True)
    assert iters <= store

    pot = make_fused_fhn_potential_dopri5(
        x0, ts, Y, noise=NOISE, rtol=RTOL, atol=ATOL, store_steps=store,
        interpret=False)
    kernel = samplers.psgld_batched(pot, 1e-7)
    state = kernel.init(theta0(C))
    run = jax.jit(lambda s, k: samplers.sample_chain(
        kernel, s, k, num_samples=1, burn_in=N_STEPS - 1)[0])
    jax.block_until_ready(run(state, jax.random.PRNGKey(8)).position)
    rate = sustained(lambda s, k: run(s, k), state)
    print(f"fused pSGLD@dopri5 FHN: {rate * C:.4g} steps/s at C={C}",
          flush=True)

    # generic comparison (vmapped per-chain bounded backprop)
    Xj = jnp.asarray(Y)
    loc = jnp.asarray([0.2, 0.2, 3.0], f32)

    def gen_pot(th):
        f = lambda tt, X: fhn_vector_field(th, tt, X)  # noqa: E731
        traj = odeint(f, x0, ts, method="dopri5", rtol=RTOL, atol=ATOL,
                      options={"mode": "bounded",
                               "max_steps_per_interval": 32})
        sse = jnp.sum((Xj - jnp.transpose(traj, (1, 0, 2))) ** 2)
        th_v = jnp.stack([th["a"], th["b"], th["c"]])
        return sse / (2 * NOISE**2) + 0.5 * jnp.sum((th_v - loc) ** 2)

    gkernel = samplers.psgld(gen_pot, 1e-7)
    gstate = jax.vmap(gkernel.init)(theta0(C_GEN))
    grun = jax.jit(lambda s, k: samplers.sample_chains(
        gkernel, s, jax.random.split(k, C_GEN), num_samples=1,
        burn_in=N_STEPS - 1)[0])
    jax.block_until_ready(grun(gstate, jax.random.PRNGKey(9)).position)
    grate = sustained(lambda s, k: grun(s, k), gstate)
    print(f"generic pSGLD@dopri5 FHN: {grate * C_GEN:.4g} steps/s "
          f"at C={C_GEN}", flush=True)
    print(f"fused/generic steps/s ratio: "
          f"{(rate * C) / (grate * C_GEN):.0f}x "
          f"(per-chain {rate / grate:.0f}x)", flush=True)


if __name__ == "__main__":
    main()

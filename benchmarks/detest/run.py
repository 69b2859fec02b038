"""DETEST harness: NFE / wall time / RMS error per problem.

Mirrors neuralode_tests/DETEST/run.py: each problem is integrated over
[t0, 20] for {dopri5, adams} x tol {1e-3, 1e-6, 1e-9} against a dopri5
tol=1e-12 reference solution, reporting per-problem NFE, wall time, and
RMS error plus per-tolerance totals and geometric-mean error.  NFE comes
from the solver's carry statistics instead of a counting RHS wrapper.

Run on the CPU backend in f64 (as the reference pins DoubleTensor,
run.py:8):  python benchmarks/detest/run.py [--methods dopri5 adams]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, __file__.rsplit("/", 3)[0])  # repo root
import detest  # noqa: E402

from bayesian_ode_tpu import odeint_with_stats  # noqa: E402


def solve(diffeq, t0, y0, rtol, atol, method):
    ts = jnp.stack([t0, jnp.asarray(20.0)])
    fn = jax.jit(
        lambda y0_: odeint_with_stats(diffeq, y0_, ts, rtol, atol, method)
    )
    ys, stats = jax.block_until_ready(fn(y0))         # compile
    start = time.perf_counter()
    ys, stats = jax.block_until_ready(fn(y0))
    wall = time.perf_counter() - start
    return jax.tree.map(lambda a: a[-1], ys), stats, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", nargs="+", default=["dopri5", "adams"])
    ap.add_argument("--tols", nargs="+", type=float,
                    default=[1e-3, 1e-6, 1e-9])
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    ref = {}
    results = []
    for method in args.methods:
        for tol in args.tols:
            print(f"======= {method} | tol={tol:e} =======")
            nfes, times, errs = [], [], []
            for name, builder in detest.ALL_PROBLEMS.items():
                diffeq, init, _ = builder()
                t0, y0 = init()
                if name not in ref:
                    sol, _, _ = solve(diffeq, t0, y0, 1e-12, 1e-12, "dopri5")
                    ref[name] = sol
                est, stats, wall = solve(diffeq, t0, y0, tol, tol, method)
                err = float(jnp.sqrt(jnp.mean((ref[name] - est) ** 2)))
                nfe = int(stats["nfe"])
                nfes.append(nfe)
                times.append(wall)
                errs.append(err)
                results.append({"method": method, "tol": tol, "problem": name,
                                "nfe": nfe, "time": wall, "err": err})
                print(f"{name}: NFE {nfe} | Time {wall:.4f} | Err {err:e}")
            geo = float(np.exp(np.mean(np.log(np.maximum(errs, 1e-300)))))
            print(
                f"Total NFE {np.sum(nfes)} | Total Time {np.sum(times):.3f} "
                f"| GeomAvg Error {geo:e}"
            )
    if args.json:
        print(json.dumps(results))


if __name__ == "__main__":
    main()

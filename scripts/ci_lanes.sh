#!/usr/bin/env bash
# Fast CI lanes (VERDICT r3 #8): the single `-m "not slow"` invocation is
# watchdog-killed at ~10-12 min under load on this machine, so the fast
# lane is split into three named lanes, each a single pytest process
# sized to finish in <5 min under load.  `bash scripts/ci_lanes.sh` runs
# all three; `bash scripts/ci_lanes.sh solvers` runs one.
set -euo pipefail
cd "$(dirname "$0")/.."

LANE="${1:-all}"

lane_solvers() {
  python -m pytest -q -m "not slow" \
    tests/test_odeint.py tests/test_gradients.py \
    tests/test_low_order_solvers.py tests/test_dopri8.py \
    tests/test_implicit.py tests/test_symplectic.py tests/test_seminorm.py \
    tests/test_dense.py tests/test_events.py tests/test_complex.py \
    tests/test_api_pytree.py tests/test_detest.py \
    tests/test_reference_parity.py
}

lane_samplers() {
  python -m pytest -q -m "not slow" \
    tests/test_samplers.py tests/test_nuts.py tests/test_tempering.py \
    tests/test_smc.py tests/test_evidence.py tests/test_ensemble.py \
    tests/test_model_comparison.py tests/test_vi.py tests/test_lbfgs.py
}

lane_models() {
  python -m pytest -q -m "not slow" \
    tests/test_models.py tests/test_neural_ode_models.py tests/test_cnf.py \
    tests/test_sde.py tests/test_linear_regression.py \
    tests/test_pallas_ops.py tests/test_utils.py tests/test_runtime.py \
    tests/test_end_to_end.py tests/test_experiments.py \
    tests/test_bench_phases.py tests/test_sharding.py
}

case "$LANE" in
  solvers)  lane_solvers ;;
  samplers) lane_samplers ;;
  models)   lane_models ;;
  all)      lane_solvers; lane_samplers; lane_models ;;
  *) echo "unknown lane '$LANE' (solvers|samplers|models|all)"; exit 2 ;;
esac

#!/usr/bin/env bash
# Fast CI lanes (VERDICT r3 #8): the single `-m "not slow"` invocation is
# watchdog-killed at ~10-12 min under load on this machine, so the fast
# lane is split into five named lanes, each ONE pytest process measured
# at ~3-4.5 min under load (per-file sweep 2026-08-20, warm compile
# cache; biggest files: test_samplers 207s, test_nuts 122s,
# test_gradients 106s, test_sde 90s).
#   bash scripts/ci_lanes.sh            # all five, sequentially
#   bash scripts/ci_lanes.sh samplers   # one lane
set -euo pipefail
cd "$(dirname "$0")/.."

LANE="${1:-all}"

lane_solvers() {   # ~3.5 min: odeint core + gradient engines
  python -m pytest -q -m "not slow" \
    tests/test_odeint.py tests/test_gradients.py tests/test_seminorm.py \
    tests/test_api_pytree.py tests/test_complex.py
}

lane_steppers() {  # ~3.5 min: solver families + battery/parity gates
  python -m pytest -q -m "not slow" \
    tests/test_low_order_solvers.py tests/test_dopri8.py \
    tests/test_implicit.py tests/test_symplectic.py tests/test_dense.py \
    tests/test_events.py tests/test_detest.py tests/test_reference_parity.py
}

lane_samplers() {  # ~4.5 min: sampler suite + particle/ensemble kernels
  python -m pytest -q -m "not slow" \
    tests/test_samplers.py tests/test_smc.py tests/test_ensemble.py \
    tests/test_lbfgs.py
}

lane_inference() { # ~4.5 min: exact samplers + evidence/VI machinery
  python -m pytest -q -m "not slow" \
    tests/test_nuts.py tests/test_tempering.py tests/test_evidence.py \
    tests/test_model_comparison.py tests/test_vi.py
}

lane_models() {    # ~4 min: model families + infra (mostly slow-marked)
  python -m pytest -q -m "not slow" \
    tests/test_models.py tests/test_neural_ode_models.py tests/test_cnf.py \
    tests/test_sde.py tests/test_linear_regression.py \
    tests/test_pallas_ops.py tests/test_utils.py tests/test_runtime.py \
    tests/test_runtime_multiprocess.py tests/test_fused_field.py \
    tests/test_fused_fhn.py \
    tests/test_end_to_end.py tests/test_experiments.py \
    tests/test_bench_phases.py tests/test_sharding.py
}

case "$LANE" in
  solvers)   lane_solvers ;;
  steppers)  lane_steppers ;;
  samplers)  lane_samplers ;;
  inference) lane_inference ;;
  models)    lane_models ;;
  all)  lane_solvers; lane_steppers; lane_samplers; lane_inference
        lane_models ;;
  *) echo "unknown lane '$LANE' (solvers|steppers|samplers|inference|models|all)"; exit 2 ;;
esac

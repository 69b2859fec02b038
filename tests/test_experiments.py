"""Experiment-driver gates: config grids, sampler/optim workers, toy
runner, artifacts on disk, checkpoint round-trip."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_ode_tpu.experiments import (
    expand_grid,
    load_config,
    run_optim,
    run_sampler,
    run_toy,
    worker,
    write_configs,
)
from bayesian_ode_tpu.models import make_dataset
from bayesian_ode_tpu.utils.checkpoint import load_pytree, save_pytree


# driver-level integration (test_experiments.py): compile-dominated; the fast
# core gate deselects with -m 'not slow', plain pytest runs all
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny_data():
    return make_dataset(jax.random.PRNGKey(0), "vdp", N=2, T=12, t_max=3.0,
                        noise=0.1, x0_scale=1.0)


def tiny_config(method, inf_type="sampler", **kw):
    cfg = {
        "method": method, "inf_type": inf_type, "id": 1, "M": 3, "sf": 1.0,
        "ell": 0.75, "noise": 0.1, "burn_in": 5, "num_samples": 10,
        "thinning": 2, "chain_start": 0, "num_chains": 4, "lr": 1e-5,
        "lr0": 1e-5, "lr_gamma": 0.51, "lr_t0": 100, "lr_alpha": 1.0,
        "psgld_alpha": 0.99, "lambda_": 1e-8, "num_iters": 5,
    }
    cfg.update(kw)
    return cfg


def test_expand_grid_and_config_io(tmp_path):
    configs = expand_grid("SGLD", {"lr0": [1e-3, 1e-4], "M": [4, 6]})
    assert len(configs) == 4
    assert all(c["method"] == "SGLD" for c in configs)
    assert "_M4" in configs[0]["dir_name"] or "_M6" in configs[0]["dir_name"]
    n = write_configs(configs, str(tmp_path / "json"), str(tmp_path / "out"),
                      data={"ode": "vdp"})
    assert n == 4
    blob = load_config(str(tmp_path / "json"), 2)
    assert blob["configs"][0]["id"] == 2


@pytest.mark.parametrize("method", ["SGLD", "pSGLD", "MALA", "aSGHMC",
                                    "BAOAB", "HMC", "AdaptiveHMC",
                                    "NUTS", "AdaptiveNUTS"])
def test_run_sampler_methods(tmp_path, tiny_data, method):
    cfg = tiny_config(method)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])
    out_dir = tmp_path / method / "1"
    assert (out_dir / "chain.npz").exists()
    assert (out_dir / "run.jsonl").exists()
    rec = json.loads((out_dir / "run.jsonl").read_text().splitlines()[-1])
    assert rec["event"] == "summary"


def test_run_sampler_plots(tmp_path, tiny_data):
    cfg = tiny_config("SGLD")
    run_sampler(cfg, tiny_data, str(tmp_path), make_plots=True)
    out_dir = tmp_path / "SGLD" / "1"
    for name in ["post.pdf", "phase_mode.pdf", "predictive_bands.pdf",
                 "logsn_hist.pdf"]:
        assert (out_dir / name).exists(), name


@pytest.mark.parametrize("method", ["Adam", "LBFGS", "SGD", "RMSprop",
                                    "Adadelta"])
def test_run_optim_methods(tmp_path, tiny_data, method):
    cfg = tiny_config(method, inf_type="optim", lr=1e-3,
                      line_search="armijo", history_size=4, mom=0.9)
    out = run_optim(cfg, tiny_data, str(tmp_path))
    assert np.isfinite(out["final_loss"])
    assert (tmp_path / method / "1" / "total_loss_arr.npy").exists()


def test_worker_routes(tmp_path, tiny_data):
    out = worker(tiny_config("SGLD"), tiny_data, str(tmp_path))
    assert "min_potential" in out
    out = worker(tiny_config("Adam", inf_type="optim", lr=1e-3),
                 tiny_data, str(tmp_path))
    assert "final_loss" in out


def test_run_toy(tmp_path):
    cfg = {"method": "MALA", "lr": 1e-2, "burn_in": 50, "num_samples": 200,
           "num_chains": 8, "id": 0}
    res = run_toy(cfg, str(tmp_path), dists=("banana", "gauss"),
                  make_plots=True)
    assert "banana" in res and "gauss" in res
    assert 0.0 < res["banana"]["acceptance"] <= 1.0
    # gauss target mean is (2, 4)
    assert abs(res["gauss"]["mean"][0] - 2.0) < 0.5
    assert abs(res["gauss"]["mean"][1] - 4.0) < 0.7
    assert (tmp_path / "MALA" / "0_densities.pdf").exists()


def test_run_toy_parallel_tempering(tmp_path):
    # replica exchange on the multimodal toy (the target family the
    # reference's single-temperature runners get stuck on)
    cfg = {"method": "PT", "lr": 5e-2, "burn_in": 100, "num_samples": 300,
           "num_chains": 8, "num_replicas": 4, "beta_min": 0.05, "id": 0}
    res = run_toy(cfg, str(tmp_path), dists=("multimodal",),
                  make_plots=False)
    assert 0.0 < res["multimodal"]["acceptance"] <= 1.0
    # symmetric 4-mixture: the tempered cold chain visits all quadrants,
    # so the mean stays near the origin
    assert abs(res["multimodal"]["mean"][0]) < 1.2
    assert abs(res["multimodal"]["mean"][1]) < 1.2


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6).reshape(2, 3), "b": (jnp.ones(4),
                                                    jnp.zeros(()))}
    path = str(tmp_path / "ckpt.npz")
    save_pytree(path, tree)
    out = load_pytree(path, tree)
    assert np.array_equal(out["a"], np.asarray(tree["a"]))
    with pytest.raises(ValueError):
        load_pytree(path, {"a": tree["a"]})


@pytest.mark.slow
def test_run_sampler_fused_engine(tmp_path, tiny_data):
    cfg = tiny_config("SGLD", engine="fused", num_chains=128)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])
    assert summary["num_chains"] == 128
    out_dir = tmp_path / "SGLD" / "1"
    assert (out_dir / "chain.npz").exists()


@pytest.mark.slow
def test_run_sampler_fused_engine_asghmc(tmp_path, tiny_data):
    cfg = tiny_config("aSGHMC", engine="fused", num_chains=128, lr=1e-4,
                      burn_in=2, num_samples=4)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])
    assert summary["num_chains"] == 128


def test_run_sampler_fused_engine_mala(tmp_path, tiny_data):
    # exact MALA through the fused engine: per-chain accept masks
    cfg = tiny_config("MALA", engine="fused", num_chains=128, lr=1e-6,
                      burn_in=2, num_samples=4)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])
    assert 0.0 <= summary["acceptance"] <= 1.0


def test_run_sampler_generic_dopri5(tmp_path, tiny_data):
    # config["solver"] routes the generic engine through adaptive dopri5
    # (HIGHEST-precision RHS; build_model docstring)
    cfg = tiny_config("SGLD", solver="dopri5", rtol=1e-5, atol=1e-7)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])


@pytest.mark.slow
def test_run_sampler_fused_engine_dopri5(tmp_path, tiny_data):
    # the BASELINE north-star configuration straight from the driver:
    # pSGLD, adaptive dopri5, fused whole-solve fwd+bwd
    cfg = tiny_config("pSGLD", engine="fused", solver="dopri5",
                      num_chains=128, burn_in=2, num_samples=4,
                      rtol=1e-5, atol=1e-7)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])
    assert summary["num_chains"] == 128


def test_fused_engine_rejects_unsupported_solver(tmp_path, tiny_data):
    cfg = tiny_config("SGLD", engine="fused", solver="tsit5",
                      num_chains=128)
    with pytest.raises(ValueError, match="fused"):
        run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    cfg = tiny_config("SGLD", model="nn", hidden=8, engine="fused",
                      solver="tsit5", num_chains=128)
    with pytest.raises(ValueError, match="fused"):
        run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)


@pytest.mark.slow
def test_run_sampler_nn_fused_engine_dopri5(tmp_path, tiny_data):
    # NN model at adaptive dopri5 tolerance through the fused
    # differentiable whole-solve MLP kernel (ops/mlp_dopri5.py)
    cfg = tiny_config("pSGLD", model="nn", hidden=8, lr0=1e-4,
                      engine="fused", solver="dopri5", num_chains=128,
                      burn_in=2, num_samples=4, rtol=1e-5, atol=1e-7)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])
    assert summary["num_chains"] == 128


@pytest.mark.slow
def test_run_sampler_nn_fused_engine_asghmc(tmp_path, tiny_data):
    # the batched kernels compose with the MLP fused potential too
    cfg = tiny_config("aSGHMC", model="nn", hidden=8, lr=1e-5,
                      engine="fused", num_chains=128, burn_in=2,
                      num_samples=4)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])


def test_run_optim_plots(tmp_path, tiny_data):
    cfg = tiny_config("Adam", inf_type="optim", lr=1e-3)
    run_optim(cfg, tiny_data, str(tmp_path), make_plots=True)
    out_dir = tmp_path / "Adam" / "1"
    for name in ["post.pdf", "post_log.pdf", "phase_map.pdf",
                 "trajectories.pdf"]:
        assert (out_dir / name).exists(), name


def test_run_sampler_nn_model(tmp_path, tiny_data):
    # the NN (MLP) mean-function baseline, generic engine + plots
    cfg = tiny_config("pSGLD", model="nn", hidden=8, lr0=1e-4)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=True)
    assert np.isfinite(summary["min_potential"])
    out_dir = tmp_path / "pSGLD" / "1"
    assert (out_dir / "chain.npz").exists()
    for name in ["post.pdf", "phase_mode.pdf"]:
        assert (out_dir / name).exists(), name


@pytest.mark.slow
def test_run_sampler_nn_fused_engine(tmp_path, tiny_data):
    # BASELINE config #3 shape on the fused kernels (interpret on CPU)
    cfg = tiny_config("pSGLD", model="nn", hidden=8, lr0=1e-4,
                      engine="fused", num_chains=128, burn_in=2,
                      num_samples=4)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])
    assert summary["num_chains"] == 128


@pytest.mark.slow
def test_run_sampler_svgd(tmp_path, tiny_data):
    # BASELINE config #5: SVGD particle ensemble on the GP posterior
    cfg = tiny_config("SVGD", lr=1e-4, num_chains=8, burn_in=3,
                      num_samples=6)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=True)
    assert np.isfinite(summary["min_potential"])
    out_dir = tmp_path / "SVGD" / "1"
    assert (out_dir / "chain.npz").exists()
    for name in ["post.pdf", "phase_mode.pdf", "logsn_hist.pdf"]:
        assert (out_dir / name).exists(), name


def test_run_sampler_pt_generic(tmp_path, tiny_data):
    # VERDICT r3 #7: replica-exchange PT behind the GP-model method
    # dispatch (the reference runs every sampler against the GP model,
    # gp.py:360-378).  Generic engine -> vmapped batch potential; the
    # summary must carry the swap-acceptance diagnostic.
    cfg = tiny_config("PT", num_chains=4, lr=1e-5, num_replicas=3,
                      beta_min=0.2, burn_in=2, num_samples=4, thinning=1)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])
    assert 0.0 <= summary["swap_acceptance"] <= 1.0
    out_dir = tmp_path / "PT" / "1"
    assert (out_dir / "chain.npz").exists()
    # recorded chain is the COLD batch: (chains, samples, ...) layout
    chain = np.load(out_dir / "chain.npz")
    assert chain["leaf_0"].shape[0] == 4


def test_run_sampler_pt_fused_engine(tmp_path, tiny_data):
    # PT over the fused batch engine: replica x chain rows through one
    # fused fwd+bwd per step
    cfg = tiny_config("PT", engine="fused", num_chains=128, lr=1e-6,
                      num_replicas=3, beta_min=0.2, burn_in=2,
                      num_samples=4, thinning=1)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])
    assert summary["num_chains"] == 128
    assert 0.0 <= summary["swap_acceptance"] <= 1.0


def test_run_sampler_ensemble_generic(tmp_path, tiny_data):
    # Goodman-Weare stretch move (gradient-free) behind the method
    # dispatch; odd chain counts round up to the even red/black split
    cfg = tiny_config("Ensemble", num_chains=7, burn_in=3, num_samples=6,
                      thinning=1, stretch_a=1.5)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])
    assert summary["num_chains"] == 8
    assert 0.0 <= summary["acceptance"] <= 1.0


def test_run_sampler_ensemble_fused_engine(tmp_path, tiny_data):
    # each stretch half-sweep scores N/2 walkers through the fused
    # kernel, so fused ensembles round to multiples of 256
    cfg = tiny_config("Ensemble", engine="fused", num_chains=128,
                      burn_in=2, num_samples=4, thinning=1)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])
    assert summary["num_chains"] == 256


def test_run_sampler_guard_finite_flag(tmp_path, tiny_data):
    # config {"guard_finite": true} sandboxes divergent chains: at an
    # absurd lr the unguarded run records NaN potentials; guarded stays
    # finite (frozen on the last finite state)
    cfg = tiny_config("SGLD", lr0=50.0, guard_finite=True)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    pots = np.load(tmp_path / "SGLD" / "1" / "total_loss_arr.npy")
    assert np.isfinite(pots).all()
    assert np.isfinite(summary["min_potential"])


def test_cli_id_all_runs_grid_slice(tmp_path):
    """`--id all` runs every config id this process owns (single process:
    the whole grid) — the one-command replacement for the reference's
    SLURM `--array` fan-out (vanderpol_gp.slrm)."""
    from bayesian_ode_tpu.experiments.run import main

    configs = [tiny_config("SGLD", num_samples=6, num_chains=2),
               tiny_config("pSGLD", num_samples=6, num_chains=2)]
    n = write_configs(configs, str(tmp_path / "json"), str(tmp_path / "out"),
                      data={"ode": "vdp", "N": 2, "T": 10, "t_max": 3.0,
                            "noise": 0.1, "seed": 0})
    assert n == 2
    main(["--json-dir", str(tmp_path / "json"), "--id", "all", "--no-plots"])
    for rid, method in ((1, "SGLD"), (2, "pSGLD")):
        out = tmp_path / "out" / method / str(rid)
        assert (out / "chain.npz").exists(), (rid, method)


def test_run_sampler_fused_engine_csgld(tmp_path, tiny_data):
    # cyclical SGLD through the fused batched kernel (csgld_batched)
    cfg = tiny_config("cSGLD", engine="fused", num_chains=128,
                      lr0=1e-5, num_cycles=2, burn_in=4, num_samples=8,
                      thinning=2)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])
    assert summary["num_chains"] == 128


def test_run_sampler_fused_engine_acsghmc(tmp_path, tiny_data):
    # cyclical aSGHMC through the fused batched kernel (acsghmc_batched)
    cfg = tiny_config("acSGHMC", engine="fused", num_chains=128,
                      lr0=1e-5, num_cycles=2, burn_in=4, num_samples=8,
                      thinning=2)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])
    assert summary["num_chains"] == 128


def test_run_sampler_fused_engine_adam_sgld(tmp_path, tiny_data):
    cfg = tiny_config("AdamSGLD", engine="fused", num_chains=128,
                      lr0=1e-5, burn_in=2, num_samples=4)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])
    assert summary["num_chains"] == 128


def test_run_sampler_fused_engine_sgrhmc(tmp_path, tiny_data):
    cfg = tiny_config("SGRHMC", engine="fused", num_chains=128,
                      lr0=1e-5, burn_in=2, num_samples=4)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])
    assert summary["num_chains"] == 128


def test_run_sampler_fused_engine_hmc(tmp_path, tiny_data):
    # exact HMC over the fused batch potential: 3 leapfrogs per proposal,
    # per-chain acceptance masks through the driver summary
    cfg = tiny_config("HMC", engine="fused", num_chains=128,
                      lr=1e-4, num_leapfrog=3, burn_in=2, num_samples=4)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])
    assert 0.0 <= summary["acceptance"] <= 1.0
    assert summary["num_chains"] == 128


def test_run_sampler_fused_engine_adaptive_hmc(tmp_path, tiny_data):
    # warmup-adaptive HMC over the fused batch potential: per-chain dual
    # averaging + Welford mass inside the fused step loop
    cfg = tiny_config("AdaptiveHMC", engine="fused", num_chains=128,
                      lr=1e-4, num_leapfrog=3, burn_in=4, num_samples=4)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])
    assert 0.0 <= summary["acceptance"] <= 1.0
    assert summary["num_chains"] == 128


def test_run_sampler_fused_engine_nuts(tmp_path, tiny_data):
    # dynamic-trajectory NUTS over the fused batch potential: per-chain
    # tree building inside the lockstep fused step loop
    cfg = tiny_config("NUTS", engine="fused", num_chains=128,
                      lr=1e-4, max_depth=3, burn_in=2, num_samples=4)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])
    assert 0.0 <= summary["acceptance"] <= 1.0
    assert summary["num_chains"] == 128


def test_worker_honors_make_plots_false(tmp_path, tiny_data):
    # regression: --no-plots must reach the vanderpol worker (run.py
    # previously only forwarded it on the toy path)
    worker(tiny_config("SGLD"), tiny_data, str(tmp_path), make_plots=False)
    assert list(tmp_path.rglob("*.pdf")) == []


def _load_script(name):
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(root, "scripts" if name == "gen_configs"
                           else "examples", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_gen_configs_condor_template(tmp_path):
    # the emitted HTCondor submit file queues exactly one job per config
    # (reference scripts/toy/gen_configs.py CLUSTER_SCRIPT_TEMPLATE)
    gc = _load_script("gen_configs")
    text = gc._CONDOR_TEMPLATE.format(json_dir="cfgs", n=81)
    assert "queue 81" in text.splitlines()[-1] or text.rstrip().endswith(
        "queue 81")
    assert "--json-dir cfgs" in text
    # ProcId is 0-based; ids are 1-based
    assert "$$([ProcId + 1])" in text


def test_make_digits_npz_layout(tmp_path):
    # real handwritten-digit scans in the MNIST npz layout consumed by
    # examples/odenet_mnist.py --mnist-npz
    pytest.importorskip("sklearn")
    mod = _load_script("make_digits_npz")
    path = str(tmp_path / "digits.npz")
    n = mod.make_digits_npz(path)
    with np.load(path) as d:
        x, y = d["x_train"], d["y_train"]
    assert n == len(y) == len(x) == 1797
    assert x.shape[1:] == (28, 28) and x.dtype == np.uint8
    assert set(np.unique(y)) == set(range(10))
    # the driver rescales by /255 into [0, 1]
    assert x.max() > 200


def test_run_vi_advi(tmp_path, tiny_data):
    from bayesian_ode_tpu.experiments.vanderpol_gp import run_vi
    cfg = tiny_config("ADVI", inf_type="vi", num_iters=30, lr=1e-2,
                      num_samples=8, elbo_samples=4)
    summary = run_vi(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["final_elbo"])
    out_dir = tmp_path / "ADVI" / "1"
    for name in ["chain.npz", "elbo_arr.npy", "variational.npz",
                 "run.jsonl", "total_loss_arr.npy"]:
        assert (out_dir / name).exists(), name
    chain = np.load(out_dir / "chain.npz")
    leaf_keys = [k for k in chain.files if k.startswith("leaf_")]
    assert leaf_keys
    # draws-as-chains layout: (num_samples draws, singleton sample axis, ...)
    assert all(chain[k].shape[:2] == (8, 1) for k in leaf_keys)


def test_run_vi_laplace_and_worker_route(tmp_path, tiny_data):
    cfg = tiny_config("Laplace", inf_type="vi", num_iters=10, lr=1.0,
                      num_samples=8)
    summary = worker(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["log_evidence"])
    assert np.isfinite(summary["potential_at_mode"])
    assert (tmp_path / "Laplace" / "1" / "variational.npz").exists()


def test_run_vi_rejects_unknown_method(tmp_path, tiny_data):
    from bayesian_ode_tpu.experiments.vanderpol_gp import run_vi
    with pytest.raises(ValueError, match="ADVI"):
        run_vi(tiny_config("SGLD", inf_type="vi"), tiny_data, str(tmp_path))


def test_run_evidence_estimators_agree(tmp_path, tiny_data):
    # VERDICT r3 #1: Bayesian model comparison ON THE REAL GP-VDP
    # posterior — the three independent log Z estimators must agree
    # within their error bars, and the predictive scores must be sane.
    from bayesian_ode_tpu.experiments.vanderpol_gp import run_evidence

    cfg = tiny_config("Evidence", inf_type="evidence", M=3, ell=0.5,
                      num_rungs=8, num_chains=16, lr=1e-3,
                      burn_in=150, num_samples=300, thinning=1,
                      smc_particles=256, smc_repeats=2, smc_moves=5,
                      laplace_iters=150)
    out = worker(cfg, tiny_data, str(tmp_path), make_plots=False)

    ss, ss_se = out["log_z_ss"], out["ss_se"]
    # GSS (posterior-fitted reference bridge) is the tight ladder
    # estimator; it must agree with SMC within error bars
    gss, gss_se = out["log_z_gss"], out["gss_se"]
    assert abs(gss - out["log_z_smc"]) < \
        3.0 * np.hypot(gss_se, out["smc_se"]) + 0.75, out
    smc, smc_se = out["log_z_smc"], out["smc_se"]
    lap = out["log_z_laplace"]
    # independent machinery, same integral: stepping stone vs SMC
    assert abs(ss - smc) < 3.0 * np.hypot(ss_se, smc_se) + 0.75, out
    # Laplace carries Gaussian-approximation bias; a few nats on this
    # mildly non-Gaussian posterior
    assert out["laplace_hessian_pd"]
    assert abs(lap - ss) < 5.0, out
    # TI's error bar on ODE posteriors is honest but enormous (the
    # integrand has prior-scale MC variance at hot rungs — see
    # evidence.py docstring); it must still bracket the SS answer
    assert abs(out["log_z_ti"] - ss) < 4.0 * out["ti_se"] + 1.0, out
    # predictive scores: finite, WAIC ~ LOO, effective params positive
    assert np.isfinite(out["waic_elpd"]) and np.isfinite(out["loo_elpd"])
    assert abs(out["waic_elpd"] - out["loo_elpd"]) < 3.0
    assert out["waic_p_eff"] > 0.0

    # artifact layout
    d = tmp_path / "Evidence" / "1"
    assert (d / "evidence.json").exists()
    assert (d / "chain.npz").exists()
    assert (d / "config.json").exists()
    detail = json.loads((d / "evidence.json").read_text())
    assert len(detail["ladder_betas"]) == 8
    assert len(detail["smc_log_z_repeats"]) == 2


def test_run_sampler_smc(tmp_path, tiny_data):
    # SMC as a driver sampler method: prior-annealed population,
    # posterior particles in the standard artifact layout, log Z in the
    # summary for free
    cfg = tiny_config("SMC", num_chains=64, smc_moves=3, smc_max_stages=40)
    summary = run_sampler(cfg, tiny_data, str(tmp_path), make_plots=False)
    assert np.isfinite(summary["min_potential"])
    assert np.isfinite(summary["log_z_smc"])
    out_dir = tmp_path / "SMC" / "1"
    assert (out_dir / "chain.npz").exists()
    chain = np.load(out_dir / "chain.npz")
    assert chain["leaf_0"].shape[:2] == (64, 1)   # (particles, 1 sample)


def test_checkpoint_resume_equals_uninterrupted(tmp_path, tiny_data,
                                                monkeypatch):
    """VERDICT r4 #7: a sampling run killed mid-chain and resumed from
    sampler_ckpt.npz must produce EXACTLY the chain of an uninterrupted
    run — PRNG keys included.  The segmented driver path
    (config ckpt_every > 0) makes this possible: segment-indexed key
    folds, burn-in only in segment 0, atomic checkpoint saves."""
    from bayesian_ode_tpu.utils import checkpoint as ckpt_mod

    cfg = tiny_config("Ensemble", thinning=1, ckpt_every=3)

    # uninterrupted reference run (same segmented code path)
    a_dir = tmp_path / "a"
    run_sampler(dict(cfg), tiny_data, str(a_dir), make_plots=False)
    chain_a = np.load(a_dir / "Ensemble" / "1" / "chain.npz")

    # interrupted run: the 3rd checkpoint save dies mid-run (the 2 prior
    # segments' checkpoints are already atomically on disk)
    b_dir = tmp_path / "b"
    real_save = ckpt_mod.save_pytree
    calls = {"n": 0}

    def dying_save(path, tree):
        calls["n"] += 1
        if calls["n"] >= 3:
            raise KeyboardInterrupt("simulated mid-run kill")
        real_save(path, tree)

    monkeypatch.setattr(ckpt_mod, "save_pytree", dying_save)
    with pytest.raises(KeyboardInterrupt):
        run_sampler(dict(cfg), tiny_data, str(b_dir), make_plots=False)
    monkeypatch.setattr(ckpt_mod, "save_pytree", real_save)
    ck = b_dir / "Ensemble" / "1" / "sampler_ckpt.npz"
    assert ck.exists()

    # resume and compare bitwise
    run_sampler(dict(cfg, resume=True), tiny_data, str(b_dir),
                make_plots=False)
    chain_b = np.load(b_dir / "Ensemble" / "1" / "chain.npz")
    assert sorted(chain_a.files) == sorted(chain_b.files)
    for k in chain_a.files:
        np.testing.assert_array_equal(chain_a[k], chain_b[k], err_msg=k)


def test_run_cli_resume_flag(tmp_path, tiny_data):
    """`python -m bayesian_ode_tpu.experiments.run --resume` plumbs
    config["resume"]=True through to the worker (completed-checkpoint
    fast path: the resumed run reuses all saved segments)."""
    from bayesian_ode_tpu.experiments.run import main as run_main

    configs = [tiny_config("Ensemble", thinning=1, ckpt_every=4)]
    json_dir, out_dir = str(tmp_path / "json"), str(tmp_path / "out")
    write_configs(configs, json_dir, out_dir,
                  data={"ode": "vdp", "N": 2, "T": 12, "t_max": 3.0,
                        "noise": 0.1, "seed": 0, "x0_scale": 1.0})
    run_main(["--json-dir", json_dir, "--id", "1", "--no-plots"])
    chain_1 = np.load(os.path.join(out_dir, "Ensemble", "1", "chain.npz"))
    # resume over the complete checkpoint: all segments reused, chain
    # identical
    run_main(["--json-dir", json_dir, "--id", "1", "--no-plots",
              "--resume"])
    chain_2 = np.load(os.path.join(out_dir, "Ensemble", "1", "chain.npz"))
    for k in chain_1.files:
        np.testing.assert_array_equal(chain_1[k], chain_2[k], err_msg=k)


def test_run_sampler_spiral_model(tmp_path, tiny_data):
    """model='spiral' (the public-fused-engine acceptance field) through
    the driver on both engines: generic rk4 and fused dopri5 (the
    ops/spiral_dopri5 registration)."""
    cfg = tiny_config("pSGLD", model="spiral", hidden=6, lr=1e-6)
    out = run_sampler(cfg, tiny_data, str(tmp_path / "gen"),
                      make_plots=True)   # plots: the NN-family quiver
    assert np.isfinite(out["min_potential"])
    assert (tmp_path / "gen" / "pSGLD" / "1" / "phase_mode.pdf").exists()

    cfg_f = tiny_config("pSGLD", model="spiral", hidden=6, lr=1e-6,
                        engine="fused", solver="dopri5", rtol=1e-4,
                        atol=1e-6, num_chains=4)
    out_f = run_sampler(cfg_f, tiny_data, str(tmp_path / "fused"),
                        make_plots=False)
    assert np.isfinite(out_f["min_potential"])
    # both engines sample the same posterior: potential scales agree
    # (loose: different solvers/step counts, tiny run)
    assert abs(out_f["min_potential"] - out["min_potential"]) \
        < 0.5 * (abs(out["min_potential"]) + 1.0)

    with pytest.raises(ValueError, match="spiral"):
        run_sampler(tiny_config("pSGLD", model="spiral", engine="fused",
                                solver="rk4"),
                    tiny_data, str(tmp_path / "bad"), make_plots=False)


def test_run_sampler_fhn_model(tmp_path):
    """model='fhn' (mechanistic theta = (a, b, c) inference,
    models/fhn_inference + the ops/fhn_dopri5 fused registration)
    through the driver on both engines, on FHN-generated data."""
    fhn_data = make_dataset(jax.random.PRNGKey(1), "fhn", N=2, T=12,
                            t_max=3.0, noise=0.1, x0_scale=1.0)
    cfg = tiny_config("pSGLD", model="fhn", lr=1e-6)
    out = run_sampler(cfg, fhn_data, str(tmp_path / "gen"),
                      make_plots=True)   # plots: the NN-family quiver
    assert np.isfinite(out["min_potential"])
    assert (tmp_path / "gen" / "pSGLD" / "1" / "phase_mode.pdf").exists()

    cfg_f = tiny_config("pSGLD", model="fhn", lr=1e-6, engine="fused",
                        solver="dopri5", rtol=1e-4, atol=1e-6,
                        num_chains=4)
    out_f = run_sampler(cfg_f, fhn_data, str(tmp_path / "fused"),
                        make_plots=False)
    assert np.isfinite(out_f["min_potential"])
    # both engines sample the same posterior: potential scales agree
    # (loose: different solvers/step counts, tiny run)
    assert abs(out_f["min_potential"] - out["min_potential"]) \
        < 0.5 * (abs(out["min_potential"]) + 1.0)

    with pytest.raises(ValueError, match="fhn"):
        run_sampler(tiny_config("pSGLD", model="fhn", engine="fused",
                                solver="rk4"),
                    fhn_data, str(tmp_path / "bad"), make_plots=False)

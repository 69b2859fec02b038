"""Stochastic-gradient MCMC samplers as pure transition kernels.

Reference suite: samplers/ of jaivardhankapoor/bayesian-ode (see SURVEY.md
§2.2).  Every sampler is a `TransitionKernel(init, step)` over pytree
positions built from `potential_fn(theta) -> -log posterior`; chains run
via `sample_chain`/`sample_chains` and shard over device meshes.
"""
from .base import (
    TransitionKernel,
    guard_finite,
    guard_finite_batched,
    init_chains,
    sample_chain,
    sample_chains,
)
from .diagnostics import (  # noqa: F401
    acceptance_rate,
    ess,
    ess_per_param,
    kernel_stein_discrepancy,
    split_rhat,
)
from .hamcmc import hamcmc  # noqa: F401
from .hamiltonian import (  # noqa: F401
    acsghmc,
    acsghmc_batched,
    asghmc,
    asghmc_batched,
    adaptive_hmc,
    adaptive_hmc_batched,
    baoab,
    baoab_batched,
    hmc,
    hmc_batched,
    sgrhmc,
    sgrhmc_batched,
)
from .langevin import (  # noqa: F401
    adam_sgld,
    adam_sgld_batched,
    asgld,
    csgld,
    csgld_batched,
    mala,
    mala_batched,
    mmala,
    psgld,
    psgld_preconditioner,
    sgld,
    psgld_batched,
    sgld_batched,
)
from .nuts import (  # noqa: F401
    adaptive_nuts,
    adaptive_nuts_batched,
    nuts,
    nuts_batched,
)
from .ensemble import (  # noqa: F401
    EnsembleState,
    stretch_move,
)
from .evidence import (  # noqa: F401
    evidence_reliability,
    EvidenceResult,
    fit_gaussian_reference,
    log_evidence,
    log_evidence_gss,
    power_ladder,
)
from .smc import (  # noqa: F401
    SMCResult,
    smc,
    systematic_resample,
)
from .model_comparison import (  # noqa: F401
    CompareResult,
    ElpdResult,
    compare,
    gpd_fit,
    psis_loo,
    waic,
)
from .metrics import (  # noqa: F401
    flat_hessian,
    hessian_metric,
    identity_metric,
    softabs_metric,
)
from .vi import (  # noqa: F401
    ADVIResult,
    advi_log_prob,
    fit_advi,
    sample_advi,
)
from .laplace import (  # noqa: F401
    LaplaceResult,
    laplace_approximation,
    sample_laplace,
)
from .tempering import (  # noqa: F401
    parallel_tempering,
    parallel_tempering_batched,
    temperature_ladder,
)
from .stein import (  # noqa: F401
    rbf_bandwidth,
    rbf_kernel,
    svgd,
    svgd_batched,
    svgd_direction,
)
from . import schedules  # noqa: F401

__all__ = [
    "TransitionKernel",
    "acceptance_rate",
    "acsghmc",
    "acsghmc_batched",
    "adam_sgld",
    "adam_sgld_batched",
    "asghmc",
    "asghmc_batched",
    "asgld",
    "adaptive_hmc",
    "adaptive_hmc_batched",
    "adaptive_nuts",
    "adaptive_nuts_batched",
    "nuts",
    "nuts_batched",
    "baoab",
    "baoab_batched",
    "hmc",
    "hmc_batched",
    "csgld",
    "csgld_batched",
    "ess",
    "guard_finite",
    "guard_finite_batched",
    "ess_per_param",
    "CompareResult",
    "ElpdResult",
    "EnsembleState",
    "EvidenceResult",
    "compare",
    "stretch_move",
    "gpd_fit",
    "psis_loo",
    "waic",
    "flat_hessian",
    "hamcmc",
    "hessian_metric",
    "identity_metric",
    "init_chains",
    "kernel_stein_discrepancy",
    "fit_gaussian_reference",
    "evidence_reliability",
    "log_evidence",
    "log_evidence_gss",
    "mala",
    "mala_batched",
    "mmala",
    "parallel_tempering",
    "parallel_tempering_batched",
    "temperature_ladder",
    "power_ladder",
    "psgld",
    "psgld_preconditioner",
    "rbf_bandwidth",
    "rbf_kernel",
    "sample_chain",
    "sample_chains",
    "schedules",
    "sgld",
    "psgld_batched",
    "sgld_batched",
    "sgrhmc",
    "sgrhmc_batched",
    "SMCResult",
    "smc",
    "systematic_resample",
    "softabs_metric",
    "split_rhat",
    "svgd",
    "svgd_batched",
    "svgd_direction",
    "ADVIResult",
    "advi_log_prob",
    "fit_advi",
    "sample_advi",
    "LaplaceResult",
    "laplace_approximation",
    "sample_laplace",
]

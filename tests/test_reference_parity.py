"""Numerical parity vs the reference torchdiffeq implementation.

North-star gate (BASELINE.md): solver + adjoint matching torchdiffeq to
<= 1e-6 on CPU x64.  These tests run the vendored reference solvers (torch,
CPU, f64) and this framework's solvers on identical problems and compare
trajectories and gradients directly.  Skipped when the reference checkout is
unavailable.
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_ode_tpu import odeint, odeint_adjoint

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "torchdiffeq")),
    reason="reference checkout not available",
)


@pytest.fixture(scope="module")
def torch_ref():
    sys.path.insert(0, REFERENCE)
    import torch

    torch.set_default_dtype(torch.float64)
    import torchdiffeq

    return torch, torchdiffeq


def _linear_system(seed=3, dim=6):
    rng = np.random.RandomState(seed)
    U = rng.randn(dim, dim) * 0.1
    A = 2 * U - (U + U.T)
    y0 = np.linspace(0.5, 1.5, dim)
    t = np.linspace(0.0, 5.0, 8)
    return A, y0, t


@pytest.mark.parametrize("method", ["dopri5", "rk4", "adams", "euler",
                                    "midpoint", "explicit_adams", "fixed_adams"])
def test_forward_solution_matches_torchdiffeq(torch_ref, method):
    torch, torchdiffeq = torch_ref
    A, y0, t = _linear_system()

    At = torch.tensor(A)
    ref = torchdiffeq.odeint(
        lambda tt, y: At @ y, torch.tensor(y0), torch.tensor(t), method=method
    ).numpy()

    Aj = jnp.asarray(A)
    mine = odeint(lambda tt, y: Aj @ y, jnp.asarray(y0), jnp.asarray(t),
                  method=method)
    assert np.max(np.abs(ref - np.asarray(mine))) < 1e-6


def test_adjoint_gradients_match_torchdiffeq(torch_ref):
    torch, torchdiffeq = torch_ref
    A, y0, t = _linear_system()

    # Reference: adjoint gradient of sum(ys^2) w.r.t. y0 and A.
    class F(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.A = torch.nn.Parameter(torch.tensor(A))

        def forward(self, tt, y):
            return self.A @ y

    f = F()
    y0_t = torch.tensor(y0, requires_grad=True)
    ys_ref = torchdiffeq.odeint_adjoint(f, y0_t, torch.tensor(t), rtol=1e-9,
                                        atol=1e-12, method="dopri5")
    loss = (ys_ref**2).sum()
    loss.backward()
    ref_gy0 = y0_t.grad.numpy()
    ref_gA = f.A.grad.numpy()

    def loss_fn(y0_, A_):
        ys = odeint_adjoint(
            lambda tt, y: A_ @ y, y0_, jnp.asarray(t), rtol=1e-9, atol=1e-12,
            method="dopri5"
        )
        return jnp.sum(ys**2)

    gy0, gA = jax.grad(loss_fn, argnums=(0, 1))(jnp.asarray(y0), jnp.asarray(A))
    assert np.max(np.abs(ref_gy0 - np.asarray(gy0))) < 1e-6
    assert np.max(np.abs(ref_gA - np.asarray(gA))) < 1e-6


def test_adjoint_time_gradients_match_torchdiffeq(torch_ref):
    torch, torchdiffeq = torch_ref
    A, y0, t = _linear_system()

    class F(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.A = torch.nn.Parameter(torch.tensor(A))

        def forward(self, tt, y):
            return self.A @ y

    f = F()
    t_t = torch.tensor(t, requires_grad=True)
    ys_ref = torchdiffeq.odeint_adjoint(f, torch.tensor(y0), t_t, rtol=1e-9,
                                        atol=1e-12, method="dopri5")
    (ys_ref**2).sum().backward()
    ref_gt = t_t.grad.numpy()

    Aj = jnp.asarray(A)

    def loss_fn(t_):
        ys = odeint_adjoint(lambda tt, y: Aj @ y, jnp.asarray(y0), t_,
                            rtol=1e-9, atol=1e-12, method="dopri5")
        return jnp.sum(ys**2)

    gt = jax.grad(loss_fn)(jnp.asarray(t))
    assert np.max(np.abs(ref_gt - np.asarray(gt))) < 1e-6

"""Complex-dtype states through odeint.

The reference's odeint docstring admits complex y0 (odeint.py:33-35);
upstream torchdiffeq realizes it by viewing complex tensors as real
pairs.  Here the same view-as-real transform happens once at the solver
boundary (ode/odeint.py:_complex_to_real), so every method — adaptive,
fixed-grid, multistep, implicit — runs on real arrays and error control
treats Re/Im as separate components.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_ode_tpu import odeint, odeint_adjoint, odeint_with_stats

W = 2.0


def rot(t, y):
    # y' = i w y  =>  y(t) = y0 exp(i w t)
    return 1j * W * y


Y0 = jnp.array([1.0 + 0.5j])


def exact(ts):
    return Y0[None] * jnp.exp(1j * W * ts)[:, None]


@pytest.mark.parametrize("method,tol,options", [
    ("dopri5", 1e-7, None), ("dopri8", 1e-7, None), ("tsit5", 1e-8, None),
    ("adams", 1e-4, None), ("fixed_adams", 1e-3, {"step_size": 0.02}),
    ("sdirk4", 1e-7, None),
])
def test_complex_rotation_accuracy(method, tol, options):
    ts = jnp.linspace(0.0, 3.0, 7)
    ys = odeint(rot, Y0, ts, rtol=1e-9, atol=1e-11, method=method,
                options=options)
    assert jnp.iscomplexobj(ys)
    assert float(jnp.abs(ys - exact(ts)).max()) < tol


def test_fixed_grid_complex():
    ts = jnp.linspace(0.0, 1.0, 101)
    ys = odeint(rot, Y0, ts, method="rk4")
    assert float(jnp.abs(ys - exact(ts)).max()) < 1e-6


def test_mixed_pytree_preserves_leaf_dtypes():
    def f(t, y):
        return {"z": 1j * y["z"], "x": -y["x"]}

    y0 = {"z": jnp.array(1.0 + 0j), "x": jnp.array(1.0)}
    ys = odeint(f, y0, jnp.linspace(0.0, 1.0, 3))
    assert jnp.iscomplexobj(ys["z"]) and not jnp.iscomplexobj(ys["x"])
    assert abs(complex(ys["z"][-1]) - np.exp(1j)) < 1e-7
    assert abs(float(ys["x"][-1]) - np.exp(-1.0)) < 1e-7


def test_stats_and_no_integration_edge():
    ts = jnp.linspace(0.0, 1.0, 3)
    ys, stats = odeint_with_stats(rot, Y0, ts)
    assert bool(stats["reached_final_time"])
    # t[0:1]: y0 returned unchanged, still complex
    y1 = odeint(rot, Y0, ts[0:1])
    assert jnp.iscomplexobj(y1) and jnp.allclose(y1[0], Y0)


def test_reverse_mode_gradient_through_complex_solve():
    def loss(a):
        def f(t, y):
            return 1j * a * y

        yT = odeint(f, jnp.array(1.0 + 0j), jnp.linspace(0.0, 1.0, 2),
                    rtol=1e-10, atol=1e-12, method="dopri5",
                    options={"mode": "bounded"})
        return jnp.real(yT[-1])

    g = jax.grad(loss)(2.0)
    # d/da Re exp(i a) = -sin a
    assert abs(float(g) + np.sin(2.0)) < 1e-7


def test_jit_vmap_complex():
    ts = jnp.linspace(0.0, 1.0, 4)

    @jax.jit
    def solve(y0):
        return odeint(rot, y0, ts, rtol=1e-8, atol=1e-10)

    y0s = jnp.stack([Y0, 2 * Y0, 3 * Y0])
    batched = jax.vmap(solve)(y0s)
    assert jnp.allclose(batched[1], solve(y0s[1]), rtol=1e-10, atol=1e-12)


def test_complex64_stays_complex64():
    ts = jnp.linspace(0.0, 1.0, 3, dtype=jnp.float32)
    ys = odeint(rot, Y0.astype(jnp.complex64), ts, rtol=1e-5, atol=1e-7)
    assert ys.dtype == jnp.complex64


def test_adjoint_raises_clearly_on_complex():
    with pytest.raises(NotImplementedError, match="complex"):
        odeint_adjoint(rot, Y0, jnp.linspace(0.0, 1.0, 3))

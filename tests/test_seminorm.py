"""Per-leaf error-norm weights and the adjoint seminorm.

`options={"norm_weights": tree}` excludes (weight 0.0) or reweights
leaves in the adaptive error norm (step_control.error_ratio);
`odeint_adjoint(..., adjoint_options={"norm": "seminorm"})` uses it to
drop the accumulated parameter-gradient leaves from the backward
solve's step control — upstream torchdiffeq's seminorm option (Kidger
et al., "Hey, that's not an ODE"); the vendored reference has no
analogue (its adjoint error-controls the full augmented state,
adjoint.py:63-98).
"""
import jax
import jax.numpy as jnp
import pytest

from bayesian_ode_tpu import odeint, odeint_adjoint, odeint_with_stats


def test_norm_weights_exclude_leaf_from_step_control():
    # the "junk" leaf forces tiny steps if it participates in the norm;
    # weight 0.0 removes it and the controlled leaf stays rtol-accurate
    def f(t, y):
        return {
            "y": -y["y"],
            "junk": 100.0 * jnp.cos(100.0 * t) * jnp.ones_like(y["junk"]),
        }

    y0 = {"y": jnp.array([1.0]), "junk": jnp.array([0.0])}
    ts = jnp.linspace(0.0, 2.0, 3)
    _, s_full = odeint_with_stats(f, y0, ts, rtol=1e-8, atol=1e-10,
                                  method="dopri5")
    ys, s_w = odeint_with_stats(
        f, y0, ts, rtol=1e-8, atol=1e-10, method="dopri5",
        options={"norm_weights": {"y": 1.0, "junk": 0.0}},
    )
    assert int(s_w["nfe"]) < 0.1 * int(s_full["nfe"])
    assert abs(float(ys["y"][-1, 0]) - float(jnp.exp(-2.0))) < 1e-8


@pytest.mark.parametrize("method", ["dopri5", "sdirk4"])
def test_norm_weights_one_is_identity(method):
    def f(t, y):
        return -y

    y0 = jnp.array([1.0, 2.0])
    ts = jnp.linspace(0.0, 1.0, 4)
    base, s0 = odeint_with_stats(f, y0, ts, rtol=1e-7, atol=1e-9,
                                 method=method)
    same, s1 = odeint_with_stats(f, y0, ts, rtol=1e-7, atol=1e-9,
                                 method=method,
                                 options={"norm_weights": 1.0})
    assert jnp.array_equal(base, same)
    assert int(s0["nfe"]) == int(s1["nfe"])


def test_adjoint_seminorm_gradients_match_default():
    W = jax.random.normal(jax.random.PRNGKey(0), (6, 6)) * 0.5

    def loss(W, adjoint_options=None):
        def fld(t, y):
            return jnp.tanh(W @ y)

        yT = odeint_adjoint(fld, jnp.ones(6), jnp.linspace(0.0, 4.0, 2),
                            rtol=1e-8, atol=1e-10,
                            adjoint_options=adjoint_options)
        return jnp.sum(yT[-1] ** 2)

    g0 = jax.grad(loss)(W)
    g1 = jax.grad(lambda w: loss(w, {"norm": "seminorm"}))(W)
    rel = float(jnp.abs(g0 - g1).max() / jnp.abs(g0).max())
    assert rel < 1e-6, rel


def test_adjoint_unknown_norm_raises():
    def fld(t, y):
        return -y

    with pytest.raises(ValueError, match="seminorm"):
        jax.grad(
            lambda a: odeint_adjoint(
                lambda t, y: -a * y, jnp.ones(2),
                jnp.linspace(0.0, 1.0, 2),
                adjoint_options={"norm": "rms"},
            )[-1].sum()
        )(1.0)

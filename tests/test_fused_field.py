"""Gates for the PUBLIC fused adaptive engine (ops/fused_field.py) and
its acceptance case, the spiral field registration (ops/spiral_dopri5.py)
— VERDICT r4 #2.

Protocol mirrors tests/test_pallas_ops.py's mlp_dopri5 gates: forward
parity against the generic dopri5 integrator, gradient parity against
float64 bounded-scan backprop truth, off-grid tile regression, and an
engine-level test of the n_wbar < n_weights contract (trailing shared
constant blocks receive zero cotangent) that neither built-in field
exercises through the public path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bayesian_ode_tpu import odeint
from bayesian_ode_tpu.models import spiral
from bayesian_ode_tpu.ops.spiral_dopri5 import (
    make_fused_spiral_potential_dopri5,
    spiral_dopri5_solve_stats,
    spiral_dopri5_trajectory,
)


def _chain_params(C, H=8, key=0, scale=0.1):
    p1 = spiral.init_params(jax.random.PRNGKey(key), hidden=H)
    return jax.tree.map(
        lambda x: (x[None] + scale * jax.random.normal(
            jax.random.PRNGKey(key + 1), (C,) + x.shape)).astype(
                jnp.float32), p1)


def _gen_traj(p, x0, ts, rtol, atol):
    """Generic per-chain dopri5 reference of the same field."""

    def one(pc):
        f = lambda tt, X: spiral.vector_field(pc, tt, X)
        with jax.default_matmul_precision("highest"):
            return odeint(f, x0, ts, method="dopri5", rtol=rtol,
                          atol=atol, options={"mode": "bounded"})

    return jnp.moveaxis(jax.vmap(one)(p), 0, 1)     # (T, C, N, 2)


@pytest.mark.slow
def test_spiral_dopri5_fused_matches_generic():
    f32, f64 = jnp.float32, jnp.float64
    H, N, T, C = 8, 3, 8, 4
    rtol, atol = 1e-5, 1e-7
    params = _chain_params(C, H)
    x0 = jnp.asarray([[2.0, 0.0], [1.0, 0.5], [-0.8, 0.9]], f32)
    ts = jnp.linspace(0.0, 2.0, T).astype(f32)

    traj = spiral_dopri5_trajectory(params, x0, ts, rtol=rtol, atol=atol,
                                    interpret=True)
    ref = _gen_traj(params, x0, ts, rtol, atol)
    rel = float(jnp.max(jnp.abs(traj - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 1e-4, rel

    # gradient parity vs float64 ground truth (frozen-step-mesh adjoint
    # error is O(rtol) relative — same bound as the MLP gate)
    W = jax.random.normal(jax.random.PRNGKey(5), traj.shape, f64)
    p64 = jax.tree.map(lambda x: x.astype(f64), params)
    g_truth = jax.grad(lambda p: jnp.sum(
        _gen_traj(p, x0.astype(f64), ts.astype(f64), rtol, atol) * W))(p64)
    g_fused = jax.grad(lambda p: jnp.sum(
        spiral_dopri5_trajectory(p, x0, ts, rtol=rtol, atol=atol,
                                 interpret=True) * W.astype(f32)))(params)
    t_flat = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_truth)])
    f_flat = jnp.concatenate(
        [x.ravel() for x in jax.tree.leaves(g_fused)]).astype(f64)
    scale = float(jnp.max(jnp.abs(t_flat)))
    err = float(jnp.max(jnp.abs(f_flat - t_flat))) / scale
    assert err < 50 * rtol, err

    # potential parity vs the generic SSE + L2 computed directly
    Y = np.asarray(jax.random.normal(jax.random.PRNGKey(7),
                                     (N, T, 2))).astype(np.float32)
    pot = make_fused_spiral_potential_dopri5(x0, ts, Y, reg=0.5, rtol=rtol,
                                             atol=atol, interpret=True)
    xode = jnp.transpose(ref, (1, 2, 0, 3))
    want = jnp.sum((jnp.asarray(Y)[None] - xode) ** 2, axis=(1, 2, 3)) \
        + 0.5 * (jnp.sum(params["w1"] ** 2, axis=(1, 2))
                 + jnp.sum(params["b1"] ** 2, axis=1)
                 + jnp.sum(params["w2"] ** 2, axis=(1, 2))
                 + jnp.sum(params["b2"] ** 2, axis=1))
    np.testing.assert_allclose(np.asarray(pot(params)), np.asarray(want),
                               rtol=2e-4)


@pytest.mark.slow
def test_spiral_dopri5_offgrid_tile_gradients():
    """A user tile off the 128 lattice must not skip trailing chains in
    the backward grid (the regression the hand-written adapters gate)."""
    f32 = jnp.float32
    N, T, C = 2, 6, 384
    params = _chain_params(C, H=8, key=3)
    x0 = jnp.asarray([[2.0, 0.0], [0.5, -0.5]], f32)
    ts = jnp.linspace(0.0, 1.0, T).astype(f32)
    W = jax.random.normal(jax.random.PRNGKey(5), (T, C, N, 2), f32)

    def loss(p, tile):
        return jnp.sum(spiral_dopri5_trajectory(
            p, x0, ts, rtol=1e-5, atol=1e-7, tile=tile,
            interpret=True) * W)

    g128 = jax.grad(lambda p: loss(p, 128))(params)
    g200 = jax.grad(lambda p: loss(p, 200))(params)
    for a, b in zip(jax.tree.leaves(g128), jax.tree.leaves(g200)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    _, st = spiral_dopri5_solve_stats(params, x0, ts, rtol=1e-5,
                                      atol=1e-7, interpret=True)
    assert st["n_iterations"].shape == (C,)
    assert int(jnp.max(st["n_iterations"])) <= 128
    assert int(jnp.min(st["n_iterations"])) >= 1
    assert int(jnp.min(st["nfe"])) >= 6


@pytest.mark.slow
def test_fused_field_shared_constant_blocks():
    """Engine contract: trailing blocks beyond n_wbar are shared
    constants — they flow into the rhs but receive ZERO cotangent, and
    the leading blocks' gradients match f64 truth.  Field:
    f(x, y) = (a x + k, a y + k) with per-chain a (cotangent) and k a
    constant block (no cotangent); closed form
    y(t) = (y0 + k/a) e^{a t} - k/a."""
    from bayesian_ode_tpu.ops.fused_field import (
        FusedField,
        fused_dopri5_trajectory,
    )

    f32 = jnp.float32
    C, T, N = 4, 6, 1
    rtol, atol = 1e-6, 1e-9

    def make_rhs(w, N_, RP):
        a, k = w

        def rhs(sx, sy):
            zero = jnp.zeros((RP - N_, sx.shape[1]), sx.dtype)
            fx = a * sx[:N_] + k
            fy = a * sy[:N_] + k
            return (jnp.concatenate([fx, zero], 0),
                    jnp.concatenate([fy, zero], 0))

        return rhs

    def make_rhs_vjp(w, N_, RP):
        a, k = w

        def vjp(sx, sy, cx, cy, wbar):
            (ga,) = wbar
            ga = ga + jnp.sum(sx[:N_] * cx[:N_], 0, keepdims=True) \
                + jnp.sum(sy[:N_] * cy[:N_], 0, keepdims=True)
            zero = jnp.zeros((RP - N_, sx.shape[1]), sx.dtype)
            return (jnp.concatenate([a * cx[:N_], zero], 0),
                    jnp.concatenate([a * cy[:N_], zero], 0), (ga,))

        return vjp

    def rhs_ref(w, pts):
        a, k = w
        return a.T[:, :, None] * pts + k.T[:, :, None]

    field = FusedField(n_weights=2, n_wbar=1, make_rhs=make_rhs,
                       make_rhs_vjp=make_rhs_vjp, rhs_ref=rhs_ref)

    a = jnp.asarray([[0.3, -0.4, 0.8, 0.1]], f32)        # (1, C)
    k = jnp.full((1, C), 0.7, f32)
    x0 = jnp.asarray([[0.5, -0.25]], f32)                 # (N, 2)
    ts = jnp.linspace(0.0, 1.5, T).astype(f32)

    ys = fused_dopri5_trajectory(field, (a, k), x0, ts, rtol=rtol,
                                 atol=atol, interpret=True)
    tt = ts[:, None]
    aa, kk = a[0][None, :], k[0][None, :]
    for d in range(2):
        want = (x0[0, d] + kk / aa) * jnp.exp(aa * tt) - kk / aa
        np.testing.assert_allclose(np.asarray(ys[:, :, 0, d]),
                                   np.asarray(want), rtol=1e-4, atol=1e-5)

    # gradients: d/da analytic; d/dk must be ZERO by the n_wbar contract
    W = jax.random.normal(jax.random.PRNGKey(2), ys.shape, f32)

    def loss(ak):
        return jnp.sum(fused_dopri5_trajectory(
            field, ak, x0, ts, rtol=rtol, atol=atol, interpret=True) * W)

    ga, gk = jax.grad(loss)((a, k))
    assert np.all(np.asarray(gk) == 0.0)

    def loss_ref(a_):
        aa_ = a_[0][None, :]
        ys_ref = jnp.stack(
            [(x0[0, d] + kk / aa_) * jnp.exp(aa_ * tt) - kk / aa_
             for d in range(2)], axis=-1)[:, :, None, :]
        return jnp.sum(ys_ref * W)

    ga_ref = jax.grad(loss_ref)(a.astype(jnp.float64))
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref),
                               rtol=5e-3, atol=1e-5)


@pytest.mark.slow
def test_gp_field_public_engine_matches_generic_and_adapter():
    """The GP field registered with the public engine: dopri5 forward
    parity against the generic integrator, gradient parity against the
    hand-written recording/replay adapter (both integrate the same step
    arithmetic; Hairer-init op order differs, so the two fused engines
    agree at O(rtol), not bitwise)."""
    from bayesian_ode_tpu.models import kernel_regression as kr
    from bayesian_ode_tpu.models import make_dataset
    from bayesian_ode_tpu.ops.gp_dopri5_grad import gp_dopri5_trajectory
    from bayesian_ode_tpu.ops.gp_field import gp_field_trajectory

    f32 = jnp.float32
    rtol, atol = 1e-5, 1e-7
    data = make_dataset(jax.random.PRNGKey(2), "vdp", N=3, T=10, t_max=3.0,
                        noise=0.05, x0_scale=1.0)
    Z = kr.make_inducing_grid(data["Y"], M=4)
    static = kr.make_static(Z, sf=1.0, ell=0.75)
    static32 = static._replace(
        Z=static.Z.astype(f32), KzzinvL=static.KzzinvL.astype(f32),
        Kzzinv=static.Kzzinv.astype(f32))
    C = 4
    params0 = kr.init_params(data["Y"], data["t"], static, noise=0.05)
    A = (jnp.einsum("mk,kd->md", static.KzzinvL, params0["U"])[None]
         + 0.02 * jax.random.normal(jax.random.PRNGKey(3), (C, 16, 2))
         ).astype(f32)
    x0 = data["x0"].astype(f32)
    ts = data["t"].astype(f32)

    def gen_traj(a):
        def one(ac):
            f = lambda tt, X: kr.vector_field_fast(
                ac, static32, tt, X, jax.lax.Precision.HIGHEST)
            return odeint(f, x0, ts, method="dopri5", rtol=rtol,
                          atol=atol, options={"mode": "bounded"})
        return jnp.moveaxis(jax.vmap(one)(a), 0, 1)

    got = gp_field_trajectory(A, x0, ts, static, rtol=rtol, atol=atol,
                              interpret=True)
    ref = gen_traj(A)
    rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 1e-4, rel

    # hand-adapter agreement at O(rtol) (different Hairer-init op order
    # can flip individual step decisions)
    hand = gp_dopri5_trajectory(A, x0, ts, static, rtol=rtol, atol=atol,
                                interpret=True)
    rel2 = float(jnp.max(jnp.abs(got - hand)) / jnp.max(jnp.abs(hand)))
    assert rel2 < 1e-4, rel2

    W = jax.random.normal(jax.random.PRNGKey(5), ref.shape, f32)
    g_hand = jax.grad(lambda a: jnp.sum(gp_dopri5_trajectory(
        a, x0, ts, static, rtol=rtol, atol=atol, interpret=True) * W))(A)
    g_got = jax.grad(lambda a: jnp.sum(gp_field_trajectory(
        a, x0, ts, static, rtol=rtol, atol=atol, interpret=True) * W))(A)
    scale = float(jnp.max(jnp.abs(g_hand)))
    err = float(jnp.max(jnp.abs(g_got - g_hand))) / scale
    assert err < 50 * rtol, err


@pytest.mark.slow
def test_gp_field_tsit5_matches_generic():
    """VERDICT r4 #8: the fused engine is solver-agnostic — gp@tsit5
    through the public engine matches the generic tsit5 integrator
    (quartic dense output from the derived TSIT5 c_mid) in values and
    f64 gradient truth."""
    from bayesian_ode_tpu.models import kernel_regression as kr
    from bayesian_ode_tpu.models import make_dataset
    from bayesian_ode_tpu.ops.gp_field import gp_field_trajectory

    f32, f64 = jnp.float32, jnp.float64
    rtol, atol = 1e-5, 1e-7
    data = make_dataset(jax.random.PRNGKey(2), "vdp", N=2, T=8, t_max=2.5,
                        noise=0.05, x0_scale=1.0)
    Z = kr.make_inducing_grid(data["Y"], M=4)
    static = kr.make_static(Z, sf=1.0, ell=0.75)
    static32 = static._replace(
        Z=static.Z.astype(f32), KzzinvL=static.KzzinvL.astype(f32),
        Kzzinv=static.Kzzinv.astype(f32))
    C = 4
    params0 = kr.init_params(data["Y"], data["t"], static, noise=0.05)
    A = (jnp.einsum("mk,kd->md", static.KzzinvL, params0["U"])[None]
         + 0.02 * jax.random.normal(jax.random.PRNGKey(3), (C, 16, 2))
         ).astype(f32)
    x0 = data["x0"].astype(f32)
    ts = data["t"].astype(f32)

    def gen_traj(a, x0_, ts_, st):
        def one(ac):
            f = lambda tt, X: kr.vector_field_fast(
                ac, st, tt, X, jax.lax.Precision.HIGHEST)
            # interp "quartic" matches the fused engine\'s dense output
            # exactly (the generic tsit5 default is the Tsitouras
            # "stages" interpolant)
            return odeint(f, x0_, ts_, method="tsit5", rtol=rtol,
                          atol=atol, options={"mode": "bounded",
                                              "interp": "quartic"})
        return jnp.moveaxis(jax.vmap(one)(a), 0, 1)

    got = gp_field_trajectory(A, x0, ts, static, rtol=rtol, atol=atol,
                              method="tsit5", interpret=True)
    ref = gen_traj(A, x0, ts, static32)
    rel = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 1e-4, rel

    W = jax.random.normal(jax.random.PRNGKey(5), ref.shape, f64)
    g_truth = jax.grad(lambda a: jnp.sum(
        gen_traj(a, x0.astype(f64), ts.astype(f64), static) * W))(
            A.astype(f64))
    g_fused = jax.grad(lambda a: jnp.sum(gp_field_trajectory(
        a, x0, ts, static, rtol=rtol, atol=atol, method="tsit5",
        interpret=True) * W.astype(f32)))(A)
    scale = float(jnp.max(jnp.abs(g_truth)))
    err = float(jnp.max(jnp.abs(g_fused.astype(f64) - g_truth))) / scale
    assert err < 50 * rtol, err


def test_fused_method_validation():
    from bayesian_ode_tpu.ode.tableaus import BOSH3
    from bayesian_ode_tpu.ops.fused_adaptive import _check_tableau
    from bayesian_ode_tpu.ops.spiral_dopri5 import spiral_field

    with pytest.raises(ValueError, match="unknown fused method"):
        from bayesian_ode_tpu.ops.fused_field import fused_dopri5_trajectory
        fused_dopri5_trajectory(spiral_field(), (jnp.zeros((1, 1)),),
                                jnp.zeros((1, 2)), jnp.linspace(0, 1, 3),
                                method="bosh3")
    with pytest.raises(ValueError, match="7-stage FSAL"):
        _check_tableau(BOSH3)


@pytest.mark.slow
def test_fused_field_many_points_multi_sublane():
    """N=9 trajectory points -> RP=16 (two sublane tiles): every prior
    fused-kernel consumer ran at N<=5 (RP=8), so the RP>8 padding /
    concatenation paths in the recording forward, dense-output emission,
    and replay backward were never exercised.  Forward parity + gradient
    sanity at N=9."""
    f32 = jnp.float32
    N, T, C = 9, 6, 4
    rtol, atol = 1e-5, 1e-7
    params = _chain_params(C, H=6, key=9)
    x0 = jnp.stack([jnp.linspace(-1.5, 2.0, N),
                    jnp.linspace(0.8, -0.9, N)], axis=-1).astype(f32)
    ts = jnp.linspace(0.0, 1.2, T).astype(f32)

    traj = spiral_dopri5_trajectory(params, x0, ts, rtol=rtol, atol=atol,
                                    interpret=True)
    assert traj.shape == (T, C, N, 2)
    ref = _gen_traj(params, x0, ts, rtol, atol)
    rel = float(jnp.max(jnp.abs(traj - ref)) / jnp.max(jnp.abs(ref)))
    assert rel < 1e-4, rel

    # gradient vs f64 truth, scale-normalized like every other fused
    # gate (elementwise relative comparisons overweigh near-zero
    # components whose O(rtol) frozen-step-mesh term is relatively huge)
    f64 = jnp.float64
    W = jax.random.normal(jax.random.PRNGKey(5), traj.shape, f64)
    p64 = jax.tree.map(lambda x: x.astype(f64), params)
    g_truth = jax.grad(lambda p: jnp.sum(
        _gen_traj(p, x0.astype(f64), ts.astype(f64), rtol, atol) * W))(p64)
    g_fused = jax.grad(lambda p: jnp.sum(
        spiral_dopri5_trajectory(p, x0, ts, rtol=rtol, atol=atol,
                                 interpret=True) * W.astype(f32)))(params)
    g_gen32 = jax.grad(lambda p: jnp.sum(
        _gen_traj(p, x0, ts, rtol, atol) * W.astype(f32)))(params)
    t_flat = jnp.concatenate([x.ravel() for x in jax.tree.leaves(g_truth)])
    f_flat = jnp.concatenate(
        [x.ravel() for x in jax.tree.leaves(g_fused)]).astype(f64)
    g_flat = jnp.concatenate(
        [x.ravel() for x in jax.tree.leaves(g_gen32)]).astype(f64)
    scale = float(jnp.max(jnp.abs(t_flat)))
    err_fused = float(jnp.max(jnp.abs(f_flat - t_flat))) / scale
    err_gen32 = float(jnp.max(jnp.abs(g_flat - t_flat))) / scale
    # this 9-point configuration reaches the f32 floor ABOVE the 50*rtol
    # adjoint bound (measured 2026-08-21: generic-f32 9.2e-4, fused
    # 9.6e-4 at rtol=1e-5; both drop ~3x at rtol=1e-6) — so gate the
    # fused error against the generic-f32 noise floor, not rtol alone
    assert err_fused < 2 * max(err_gen32, 50 * rtol), \
        (err_fused, err_gen32)

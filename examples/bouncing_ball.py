"""Bouncing ball via `odeint_event`: learn a coefficient of restitution.

No reference analogue (the vendored torchdiffeq predates event support);
this mirrors upstream torchdiffeq's bouncing-ball event demo.  A ball
falls under gravity, each ground contact is located by `odeint_event`,
and the velocity is reflected with a restitution coefficient `e`.  The
demo then RECOVERS `e` by gradient descent on the observed apex heights —
gradients flow through every event time via the implicit-function-theorem
reroute (see bayesian_ode_tpu/ode/events.py).

  python examples/bouncing_ball.py [--bounces 4] [--iters 150]
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import optax

from bayesian_ode_tpu import odeint_event

G = 9.8


def dyn(t, s):
    # s = [height, velocity]
    return jnp.stack([s[1], jnp.asarray(-G, s.dtype)])


def ground(t, s):
    return s[0]


def simulate(e, h0, n_bounces):
    """Drop from rest at h0; return (event_times, apex_heights) of each
    of n_bounces post-contact flight arcs."""
    def one_bounce(carry, _):
        t0, s0 = carry
        # strictly above ground until contact, so g flips + -> -
        et, ys = odeint_event(
            dyn, s0, t0, event_fn=ground, rtol=1e-8, atol=1e-10,
            options={"mode": "bounded", "max_steps_per_interval": 64},
        )
        v_impact = ys[-1, 1]
        s1 = jnp.stack([jnp.zeros_like(v_impact) + 1e-9, -e * v_impact])
        apex = (e * v_impact) ** 2 / (2 * G)
        return (et, s1), (et, apex)

    s0 = jnp.array([h0, 0.0])
    (_, _), (ets, apexes) = jax.lax.scan(
        one_bounce, (jnp.asarray(0.0, s0.dtype), s0), None, length=n_bounces
    )
    return ets, apexes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--e-true", type=float, default=0.73)
    args = ap.parse_args()

    h0 = 10.0
    ets_obs, apex_obs = simulate(args.e_true, h0, args.bounces)
    print("observed contact times:", [f"{t:.4f}" for t in ets_obs])
    print("observed apex heights :", [f"{a:.4f}" for a in apex_obs])

    def loss(log_e):
        _, apex = simulate(jax.nn.sigmoid(log_e), h0, args.bounces)
        return jnp.sum((apex - apex_obs) ** 2)

    opt = optax.adam(args.lr)
    log_e = jnp.asarray(0.0)  # e0 = 0.5
    state = opt.init(log_e)
    vg = jax.jit(jax.value_and_grad(loss))
    for it in range(args.iters):
        v, g = vg(log_e)
        upd, state = opt.update(g, state)
        log_e = optax.apply_updates(log_e, upd)
        if it % 25 == 0 or it == args.iters - 1:
            print(f"iter {it:4d}  loss {float(v):.3e}  "
                  f"e {float(jax.nn.sigmoid(log_e)):.5f}")

    e_hat = float(jax.nn.sigmoid(log_e))
    print(f"recovered e = {e_hat:.5f} (true {args.e_true})")
    assert abs(e_hat - args.e_true) < 1e-3, "restitution not recovered"
    print("OK")


if __name__ == "__main__":
    main()

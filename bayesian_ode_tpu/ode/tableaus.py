"""Butcher tableaus for the explicit Runge-Kutta solvers.

These are mathematical constants (Dormand-Prince-Shampine 5(4) and
Tsitouras 5(4)), the same coefficient sets the reference carries in
`torchdiffeq/_impl/dopri5.py:11-36` and `tsit5.py:7-39`.  They are stored as
plain Python float lists; the RK engine casts them to the state dtype at trace
time so that f32 TPU runs and f64 CPU gate runs both read full-precision
constants.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence


class ButcherTableau(NamedTuple):
    """Explicit RK tableau with embedded error estimate.

    alpha:   stage times c_2..c_{s} (the first stage is at t0).
    beta:    ragged lower-triangular stage weights, beta[i] has i+1 entries.
    c_sol:   solution weights b_i over all s+1 stages (incl. FSAL stage).
    c_error: b_i - b*_i, weights of the embedded error estimate.
    c_mid:   optional midpoint weights for 4th-order dense output.
    order:   order used by the step-size controller.
    """

    alpha: Sequence[float]
    beta: Sequence[Sequence[float]]
    c_sol: Sequence[float]
    c_error: Sequence[float]
    order: int
    c_mid: Optional[Sequence[float]] = None

    @property
    def is_fsal(self) -> bool:
        # First-Same-As-Last: the last stage is evaluated at (t1, y1), so the
        # combine step is free and f1 = k[-1].  True for DOPRI5/TSIT5/BOSH3;
        # non-FSAL tableaus (FEHLBERG2, ADAPTIVE_HEUN) pay one extra RHS
        # evaluation per step for f(t1, y1) (runge_kutta.runge_kutta_step).
        return self.c_sol[-1] == 0.0 and list(self.c_sol[:-1]) == list(self.beta[-1])

    @property
    def nfe_per_step(self) -> int:
        # RHS evaluations per attempted step beyond the carried f0: the s
        # tableau stages, plus the fresh f(t1, y1) non-FSAL methods need.
        return len(self.alpha) + (0 if self.is_fsal else 1)


# Dormand-Prince-Shampine 5(4).  Coefficients as in Hairer I.II; identical
# constant set to reference dopri5.py:11-31.
DOPRI5 = ButcherTableau(
    alpha=[1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0],
    beta=[
        [1 / 5],
        [3 / 40, 9 / 40],
        [44 / 45, -56 / 15, 32 / 9],
        [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
        [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
        [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
    ],
    c_sol=[35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0],
    c_error=[
        35 / 384 - 1951 / 21600,
        0.0,
        500 / 1113 - 22642 / 50085,
        125 / 192 - 451 / 720,
        -2187 / 6784 - -12231 / 42400,
        11 / 84 - 649 / 6300,
        -1.0 / 60.0,
    ],
    # Midpoint-evaluation weights for the quartic dense-output fit
    # (reference DPS_C_MID, dopri5.py:33-36).
    c_mid=[
        6025192743 / 30085553152 / 2,
        0.0,
        51252292925 / 65400821598 / 2,
        -2691868925 / 45128329728 / 2,
        187940372067 / 1594534317056 / 2,
        -1776094331 / 19743644256 / 2,
        11237099 / 235043384 / 2,
    ],
    order=5,
)

# Tsitouras 5(4), coefficients from Tsitouras (2011); identical constant set
# to reference tsit5.py:7-28.
TSIT5 = ButcherTableau(
    alpha=[0.161, 0.327, 0.9, 0.9800255409045097, 1.0, 1.0],
    beta=[
        [0.161],
        [-0.008480655492357, 0.3354806554923570],
        [2.897153057105494, -6.359448489975075, 4.362295432869581],
        [5.32586482843925895, -11.74888356406283, 7.495539342889836, -0.09249506636175525],
        [
            5.86145544294642038,
            -12.92096931784711,
            8.159367898576159,
            -0.071584973281401006,
            -0.02826905039406838,
        ],
        [
            0.09646076681806523,
            0.01,
            0.4798896504144996,
            1.379008574103742,
            -3.290069515436081,
            2.324710524099774,
        ],
    ],
    c_sol=[
        0.09646076681806523,
        0.01,
        0.4798896504144996,
        1.379008574103742,
        -3.290069515436081,
        2.324710524099774,
        0.0,
    ],
    # b_i - bhat_i of the embedded 4th-order pair.  NOTE: deliberate fix vs
    # the reference: tsit5.py:21-28 subtracts the *difference* coefficients
    # btilde_i as if they were bhat_i, leaving an error row that sums to
    # ~0.97 instead of 0 — the estimate is then O(dt) and the controller
    # collapses the step size (the reference never tests tsit5).  These are
    # the correct Tsitouras (2011) values.
    c_error=[
        0.00178001105222577714,
        0.0008164344596567469,
        -0.007880878010261995,
        0.1447110071732629,
        -0.5823571654525552,
        0.4580821059291869,
        -1 / 66,
    ],
    order=5,
)


# Bogacki-Shampine 3(2).  Beyond the vendored reference's registry
# (odeint.py:8-17 stops at the 5(4) pairs) but part of upstream
# torchdiffeq's, so migrating users find the name; FSAL, 3 effective
# stages — the cheap adaptive method for loose tolerances.
BOSH3 = ButcherTableau(
    alpha=[1 / 2, 3 / 4, 1.0],
    beta=[
        [1 / 2],
        [0.0, 3 / 4],
        [2 / 9, 1 / 3, 4 / 9],
    ],
    c_sol=[2 / 9, 1 / 3, 4 / 9, 0.0],
    # b - bhat with the embedded 2nd-order bhat = [7/24, 1/4, 1/3, 1/8].
    c_error=[2 / 9 - 7 / 24, 1 / 3 - 1 / 4, 4 / 9 - 1 / 3, -1 / 8],
    order=3,
)

# Fehlberg RK1(2).  Upstream-torchdiffeq name; non-FSAL.
FEHLBERG2 = ButcherTableau(
    alpha=[1 / 2, 1.0],
    beta=[
        [1 / 2],
        [1 / 256, 255 / 256],
    ],
    c_sol=[1 / 512, 255 / 256, 1 / 512],
    # b - bhat with the 1st-order bhat = [1/256, 255/256, 0].
    c_error=[1 / 512 - 1 / 256, 0.0, 1 / 512],
    order=2,
)

# Heun-Euler 2(1): trapezoidal corrector with embedded Euler error
# estimate.  Upstream-torchdiffeq name 'adaptive_heun'; non-FSAL.
ADAPTIVE_HEUN = ButcherTableau(
    alpha=[1.0],
    beta=[[1.0]],
    c_sol=[1 / 2, 1 / 2],
    # b - bhat with the embedded Euler bhat = [1, 0].
    c_error=[-1 / 2, 1 / 2],
    order=2,
)


def tsit5_interp_coeffs(theta):
    """Dense-output weights b_i(theta) for the Tsitouras interpolant.

    Same polynomial family as reference `_interp_coeff_tsit5` (tsit5.py:30-39)
    evaluated at theta = (t - t0)/dt in [0, 1].  Note: unlike the reference,
    the evaluation site combines them as y0 + dt * sum_i b_i(theta) k_i with
    the true interval-start y0 (the reference erroneously substitutes k[0]=f0
    for y0 at tsit5.py:44; we implement the correct interpolant).
    """
    t = theta
    b1 = -1.0530884977290216 * t * (t - 1.3299890189751412) * (t * t - 1.4364028541716351 * t + 0.7139816917074209)
    b2 = 0.1017 * t * t * (t * t - 2.1966568338249754 * t + 1.2949852507374631)
    b3 = 2.490627285651252793 * t * t * (t * t - 2.38535645472061657 * t + 1.57803468208092486)
    b4 = -16.54810288924490272 * (t - 1.21712927295533244) * (t - 0.61620406037800089) * t * t
    b5 = 47.37952196281928122 * (t - 1.203071208372362603) * (t - 0.658047292653547382) * t * t
    b6 = -34.87065786149660974 * (t - 1.2) * (t - 0.666666666666666667) * t * t
    b7 = 2.5 * (t - 1.0) * (t - 0.6) * t * t
    return [b1, b2, b3, b4, b5, b6, b7]

"""Independent 1D steady-state oracle for SHMIP suite A (de Fleurian et al.
2018, J. Glaciol. 64/248) under SHAKTI physics.

Suite A is y-uniform (100 km x 20 km rectangle, flat bed, sqrt surface,
steady uniform distributed input), so the steady SHAKTI equations reduce
exactly to a two-point boundary-value ODE in x, which this module solves
with scipy shooting — sharing NO code with the framework's FEM/solver
layers (the same independence contract as oracle/reference_oracle.py).

Steady SHAKTI system (Sommers et al. 2018 GMD, eqs. 1-6; framework
physics/constitutive.py expresses the same closures):

    dq/dx = m / rho_w + input                     (mass, y-uniform)
    m     = (G + rho_w g q^2 / T) / L_h           (dissipation + geothermal)
    0     = m / rho_i - A b N^3                   (steady gap evolution)
    q     = -T dh/dx,   T = b^3 g / (12 nu (1 + omega Re)),  Re = |q| / nu
    dN/dx = rho_i g dz_s/dx + rho_w g q / T       (flat bed)

with N(0) = rho_i g z_s(0) at the margin and q(L) = 0 at the divide.
At a point, eliminating b = m / (rho_i A N^3) turns the melt relation into
the quartic  L_h m^4 - G m^3 - rho_w g q^2 D k^3 = 0  (single positive
root), with D = 12 nu (1 + omega |q|/nu) / g and k = rho_i A N^3.

The Warburton melt-regularization term is neglected: for suite A's smooth
steady profiles it is O(b m b_x^2) ~ 1e-18 of m (see framework
physics/constitutive.melt_regularization).
"""

from __future__ import annotations

import numpy as np
from scipy.integrate import solve_ivp
from scipy.optimize import brentq

# SHAKTI constants (reference source/params.py:4-11)
G_CONST = 9.81
RHO_I = 917.0
RHO_W = 1000.0
NU = 1.787e-6
LH = 3.34e5
OMEGA = 1e-3
A_GLEN = 2.24e-24

LX = 100e3

# SHMIP table 2 suite A inputs [m/s]
CASES_A = {
    "A1": 7.93e-11, "A2": 1.59e-9, "A3": 5.79e-9,
    "A4": 2.5e-8, "A5": 4.5e-8, "A6": 5.79e-7,
}


def surface(x):
    return 6.0 * (np.sqrt(x + 5000.0) - np.sqrt(5000.0)) + 1.0


def dsurface_dx(x):
    return 3.0 / np.sqrt(x + 5000.0)


def melt_rate(q, N, G):
    """Unique positive root of  f(m) = L_h m^4 - G m^3 - c = 0,
    c = rho_w g q^2 D k^3.

    Starting from m0 = max(G/L_h, (c/L_h)^(1/4)) — a provable lower bound
    of the root where f is increasing and convex — Newton converges
    monotonically from below.
    """
    k = RHO_I * A_GLEN * N ** 3
    D = 12.0 * NU * (1.0 + OMEGA * abs(q) / NU) / G_CONST
    c = RHO_W * G_CONST * q * q * D * k ** 3
    if c == 0.0:
        return G / LH
    m = max(G / LH, (c / LH) ** 0.25)
    for _ in range(100):
        f = LH * m ** 4 - G * m ** 3 - c
        df = 4.0 * LH * m ** 3 - 3.0 * G * m ** 2
        step = f / df
        m -= step
        if abs(step) < 1e-14 * m:
            break
    return m


def _rhs(x, y, input_rate, G):
    N, q = y
    N = max(N, 1.0)                      # guard during shooting transients
    m = melt_rate(q, N, G)
    k = RHO_I * A_GLEN * N ** 3
    b = m / k
    D = 12.0 * NU * (1.0 + OMEGA * abs(q) / NU) / G_CONST
    T = b ** 3 / D
    dq = m / RHO_W + input_rate
    dN = RHO_I * G_CONST * dsurface_dx(x) + RHO_W * G_CONST * q / T
    return [dN, dq]


def _integrate(q_margin, input_rate, G, x_eval=None):
    """Forward (margin -> divide) integration: the direction in which the
    physical branch is an attractor (backward, an N-perturbation feeds back
    through T with the wrong sign and blows up)."""
    N_margin = RHO_I * G_CONST * surface(0.0)
    sol = solve_ivp(_rhs, (0.0, LX), [N_margin, q_margin],
                    args=(input_rate, G), method="LSODA",
                    rtol=1e-10, atol=[1e-2, 1e-18], t_eval=x_eval)
    return sol


def steady_profile(case: str, G: float = 0.05, n_x: int = 201):
    """Steady 1D profiles for a suite-A case, shooting on the margin
    discharge q(0) so that q vanishes at the divide.

    Returns dict(x, N, q, b, m): x ascending from margin to divide.
    """
    input_rate = CASES_A[case]
    # base outflow if melt were geothermal-only
    base = (input_rate + G / LH / RHO_W) * LX

    def miss(q0):
        sol = _integrate(q0, input_rate, G)
        return sol.y[1, -1]

    lo, hi = -20.0 * base, -base
    flo, fhi = miss(lo), miss(hi)
    while flo * fhi > 0 and hi < -1e-3 * base:
        hi *= 0.5
        fhi = miss(hi)
    if flo * fhi > 0:
        raise RuntimeError(f"{case}: shooting bracket failed ({flo}, {fhi})")
    q0 = brentq(miss, lo, hi, xtol=1e-18, rtol=1e-14)

    x = np.linspace(0.0, LX, n_x)
    sol = _integrate(q0, input_rate, G, x_eval=x)
    N, q = sol.y[0], sol.y[1]
    m = np.array([melt_rate(qi, Ni, G) for qi, Ni in zip(q, N)])
    b = m / (RHO_I * A_GLEN * np.maximum(N, 1.0) ** 3)
    return {"x": x, "N": N, "q": q, "b": b, "m": m, "q_margin": q0}


if __name__ == "__main__":
    for case in ("A1", "A3", "A5"):
        p = steady_profile(case)
        mid = np.searchsorted(p["x"], 50e3)
        print(f"{case}: N(50km) = {p['N'][mid] / 1e6:.3f} MPa, "
              f"b(50km) = {p['b'][mid] * 100:.3f} cm, "
              f"q(0) = {p['q'][0]:.3e} m^2/s")

"""Independent 2D finite-volume oracle for SHMIP suite A under SHAKTI
physics — the second, fully-2D leg of the oracle triangle.

Why a SECOND oracle: the 1D shooting oracle (oracle/shmip_oracle.py) is
exact for the y-uniform steady state but cannot represent the 2D
channelized states the high-melt cases (A3-A6) actually reach, so the
framework's window deviations there (relb up to ~2) were only *explained*
as "2D channelization y-spread" without an independent bound.  This
module bounds them: a cell-centered finite-volume discretization on a
structured grid, assembled with scipy.sparse and solved with direct
sparse LU — sharing NO code, NO discretization (FV vs P1 FEM), NO linear
algebra (direct LU vs matrix-free Newton-Krylov), and NO language layer
(numpy/scipy vs JAX) with the framework.  Only the physical constants and
closures are common (the physics contract, Sommers et al. 2018 GMD
eqs. 1-6; reference source/constitutive.py).

Two modes:

* ``steady_uniform`` — damped fixed-point for the y-uniform steady state
  (geometric relaxation of b toward its pointwise gap equilibrium
  b = m / (rho_i A N |N|^2), with an exact linear elliptic N-solve per
  iteration).  This state is the 2D-FV twin of the 1D oracle profile:
  the two agreeing (independent discretizations, independent solvers)
  anchors BOTH oracles' numerics.

* ``march`` — pseudo-time integration of the physical gap dynamics:
  per step, `_quasi_static_N` converges the instantaneous head system
  (N, Re, melt) by a damped fixed point (the head equation is
  quasi-static in SHAKTI — lagging it across steps bounced
  dt-independently), then a per-cell exponential integrator advances
  the gap ODE (the explicit melt-opening feedback is stiff); adaptive
  dt on the live-cell relative change.  History note: this module
  originally carried a recharge SIGN bug in the elliptic rhs
  (`- inp` — recharge acted as drainage), which drove every march into
  a sealed degenerate basin (b at the floor, N at overburden) and
  spawned a family of symptom-level hardening patches; the fixed
  equations are validated by `_quasi_static_N` reproducing the
  column-Newton steady state at the uniform branch (A5 60x12: 6%
  relL2, the O(h) gap between the two flux discretizations).
  Measured march results live in SHMIP.md suite O.

Discretization notes: face transmissivities are harmonic means (the
standard FV choice for strongly varying coefficients — b^3 spans
decades); the margin boundary (x = 0) applies the SHMIP zero water
pressure condition h = 0 through a half-cell ghost; all other boundaries
are no-flux.  The Warburton melt-regularization term is included
explicitly (central differences, lagged fields) — the 1D oracle neglects
it; here it costs nothing and removes that blind spot.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

# SHAKTI constants (physics contract; reference source/params.py:4-11)
G_GRAV = 9.81
RHO_I = 917.0
RHO_W = 1000.0
NU = 1.787e-6
LH = 3.34e5
OMEGA = 1e-3
A_GLEN = 2.24e-24
N_GLEN = 3.0

LX, LY = 100e3, 20e3
G_FLUX = 0.05               # geothermal [W/m^2]

CASES_A = {
    "A1": 7.93e-11, "A2": 1.59e-9, "A3": 5.79e-9,
    "A4": 2.5e-8, "A5": 4.5e-8, "A6": 5.79e-7,
}


def surface(x):
    return 6.0 * (np.sqrt(x + 5000.0) - np.sqrt(5000.0)) + 1.0


class Grid:
    """Structured cell grid.  Default (no keyword args) is the suite-A
    100x20 km rectangle with the SHMIP sqrt surface and a flat z = 0 bed
    — bit-identical to the original suite-A-only grid.  The keyword args
    generalize it to the suite-E valley (VERDICT r4 item 4): 2D surface
    and bed elevation, an active-cell footprint ``mask`` (faces into
    inactive cells are no-flux; inactive cells are held at N = 0), and a
    per-row ghost head ``margin_h`` at the x = 0 margin faces (p_w = 0
    there means h = bed elevation; the suite-A bed is 0)."""

    def __init__(self, nx=100, ny=20, lx=LX, ly=LY, y0=0.0,
                 zs=None, zb=None, mask=None, margin_h=None):
        self.nx, self.ny = nx, ny
        self.lx, self.ly = lx, ly
        self.dx, self.dy = lx / nx, ly / ny
        self.x = (np.arange(nx) + 0.5) * self.dx          # cell centers
        self.y = y0 + (np.arange(ny) + 0.5) * self.dy
        if zs is None:
            zs = np.broadcast_to(surface(self.x)[None, :], (ny, nx))
        self.zs = np.array(zs, dtype=float)
        self.zb = (np.zeros((ny, nx)) if zb is None
                   else np.array(zb, dtype=float))
        self.thick = np.maximum(self.zs - self.zb, 0.0)
        # head at N = 0 (flotation): h = z_b + (rho_i/rho_w) H; the
        # suite-A bed is 0, reducing to the original (rho_i/rho_w) z_s
        self.h0 = self.zb + (RHO_I / RHO_W) * self.thick
        self.mask = (np.ones((ny, nx), dtype=bool) if mask is None
                     else np.asarray(mask, dtype=bool))
        self.margin_h = (np.zeros(ny) if margin_h is None
                         else np.asarray(margin_h, float) * np.ones(ny))
        self.area = self.dx * self.dy
        self.n = nx * ny

    def idx(self, j, i):
        return j * self.nx + i


def _harmonic(a, b):
    s = a + b
    out = np.zeros_like(a)
    m = s > 0
    out[m] = 2.0 * a[m] * b[m] / s[m]
    return out


B_FLOOR = 1e-5          # gap floor inside T (the framework's b_min default)
B_TARGET_MAX = 10.0     # clip on the pointwise gap equilibrium


def _transmissivity(b, Re):
    bf = np.maximum(np.abs(b), B_FLOOR)
    return (bf ** 3) * G_GRAV / (12.0 * NU * (1.0 + OMEGA * Re))


def _re_selfconsistent(b, gradmag):
    """Pointwise self-consistent Reynolds closure: the flux law
    q = -T(Re) grad h with Re = |q|/nu gives |q|(1 + omega |q|/nu) = K,
    K = b^3 g |grad h|/(12 nu); stable positive root.  The naive lag
    Re <- |q_step|/nu has gain > 1 through T (measured on the A3 march:
    Re flipped 3e2 <-> 4e3 GLOBALLY every step, dt-independently,
    pinning the step controller at its floor) — the same pathology the
    framework closes with this identical quadratic root
    (solve/monolithic.py)."""
    bf = np.maximum(np.abs(b), B_FLOOR)
    K = (bf ** 3) * G_GRAV * gradmag / (12.0 * NU)
    q = (NU / (2.0 * OMEGA)) * (np.sqrt(1.0 + 4.0 * OMEGA * K / NU) - 1.0)
    return q / NU


def _solve_N(g: Grid, T, N_lin_coef, rhs_cells):
    """Exact linear elliptic solve for N given cell transmissivities T,
    a linearized-closure diagonal coefficient (A b |N_old|^2, units 1/s
    per N), and the melt/input source.  Discrete balance per cell:

        sum_f a_f (N_nb - N_i) - area * coef_i * N_i
            = area * rhs_i + sum_f T_f (h0_nb - h0_i) len_f / d

    with a_f = T_f len_f / (d rho_w g); the margin (x=0) face uses a
    half-cell ghost at h = margin_h (the SHMIP zero-water-pressure
    margin: h = bed elevation there; 0 on the suite-A flat bed).
    Inactive cells (outside ``g.mask``) have T forced to 0 (harmonic
    face transmissivities then vanish, making every face into them
    no-flux) and are pinned to N = 0 by an identity row.
    """
    nx, ny = g.nx, g.ny
    n = g.n
    T = np.where(g.mask, T, 0.0)
    rows, cols, vals = [], [], []
    rhs = g.area * np.broadcast_to(rhs_cells, (ny, nx)).ravel().copy()

    def add(r, c, v):
        rows.append(r); cols.append(c); vals.append(v)

    J, I = np.meshgrid(np.arange(ny), np.arange(nx), indexing="ij")
    ids = g.idx(J, I)

    # x-faces between (j, i) and (j, i+1)
    Tf = _harmonic(T[:, :-1], T[:, 1:])
    af = Tf * g.dy / (g.dx * RHO_W * G_GRAV)
    dh0 = g.h0[:, 1:] - g.h0[:, :-1]
    src = Tf * dh0 * g.dy / g.dx
    li, ri = ids[:, :-1].ravel(), ids[:, 1:].ravel()
    afv, srcv = af.ravel(), src.ravel()
    for (rr, cc, vv) in ((li, ri, afv), (ri, li, afv),
                         (li, li, -afv), (ri, ri, -afv)):
        add(rr, cc, vv)
    np.add.at(rhs, li, srcv)
    np.add.at(rhs, ri, -srcv)

    # y-faces between (j, i) and (j+1, i): the suite-A h0 is y-uniform
    # (src term exactly 0); the valley bed varies with y, so the same
    # flux-splitting src as the x-faces applies
    Tf = _harmonic(T[:-1, :], T[1:, :])
    af = (Tf * g.dx / (g.dy * RHO_W * G_GRAV)).ravel()
    dh0 = g.h0[1:, :] - g.h0[:-1, :]
    srcy = Tf * dh0 * g.dx / g.dy
    lo, hi = ids[:-1, :].ravel(), ids[1:, :].ravel()
    for (rr, cc, vv) in ((lo, hi, af), (hi, lo, af),
                         (lo, lo, -af), (hi, hi, -af)):
        add(rr, cc, vv)
    np.add.at(rhs, lo, srcy.ravel())
    np.add.at(rhs, hi, -srcy.ravel())

    # margin ghost faces at x = 0 (column i = 0): h_ghost = margin_h,
    # d = dx/2 (T is already 0 on inactive rows)
    Tg = T[:, 0]
    ag = Tg * g.dy / ((g.dx / 2.0) * RHO_W * G_GRAV)
    gi = ids[:, 0].ravel()
    add(gi, gi, -ag)
    # flux term src: T_g (h0_ghost - h0_i) len / d
    np.add.at(rhs, gi,
              Tg * (g.margin_h - g.h0[:, 0]) * g.dy / (g.dx / 2.0))

    # linearized closure diagonal (active cells only)
    add(ids.ravel(), ids.ravel(),
        -g.area * np.where(g.mask, N_lin_coef, 0.0).ravel())

    # inactive cells: identity rows pinning N = 0 (no face couples to
    # them — T was zeroed — so this keeps the matrix nonsingular)
    inact = ~g.mask.ravel()
    if inact.any():
        ii = ids.ravel()[inact]
        add(ii, ii, -np.ones(ii.size))
        rhs[inact] = 0.0

    A = sp.csr_matrix((np.concatenate(vals),
                       (np.concatenate(rows), np.concatenate(cols))),
                      shape=(n, n))
    N = spla.spsolve(-A, -rhs)
    return N.reshape(ny, nx)


def _fields_from_N(g: Grid, N, T):
    """h, cell-centered grad h, q = -T grad h, |q|, dissipation
    T |grad h|^2.  Mask-aware one-sided differencing: central where both
    neighbors are active, one-sided where only one is, 0 where neither —
    on an all-active grid this reproduces the original stencil exactly
    (central interior, ghost-mirrored margin column, one-sided far
    edges).  The x = 0 margin ghost mirrors h through ``margin_h`` at
    the face (h = 0 there on the suite-A flat bed)."""
    h = g.h0 - N / (RHO_W * G_GRAV)
    act = g.mask
    aL = np.zeros_like(act); aL[:, 1:] = act[:, :-1]
    aR = np.zeros_like(act); aR[:, :-1] = act[:, 1:]
    hL = np.zeros_like(h); hL[:, 1:] = h[:, :-1]
    hR = np.zeros_like(h); hR[:, :-1] = h[:, 1:]
    hL[:, 0] = 2.0 * g.margin_h - h[:, 0]            # margin face ghost
    aL[:, 0] = act[:, 0]
    gx = np.where(aL & aR, (hR - hL) / (2 * g.dx),
                  np.where(aR, (hR - h) / g.dx,
                           np.where(aL, (h - hL) / g.dx, 0.0)))
    aD = np.zeros_like(act); aD[1:, :] = act[:-1, :]
    aU = np.zeros_like(act); aU[:-1, :] = act[1:, :]
    hD = np.zeros_like(h); hD[1:, :] = h[:-1, :]
    hU = np.zeros_like(h); hU[:-1, :] = h[1:, :]
    gy = np.where(aD & aU, (hU - hD) / (2 * g.dy),
                  np.where(aU, (hU - h) / g.dy,
                           np.where(aD, (h - hD) / g.dy, 0.0)))
    gx = np.where(act, gx, 0.0)
    gy = np.where(act, gy, 0.0)
    qx, qy = -T * gx, -T * gy
    qmag = np.hypot(qx, qy)
    diss = RHO_W * G_GRAV * T * (gx * gx + gy * gy)
    return h, qx, qy, qmag, diss


def _warburton(g: Grid, b, m):
    """m_diff = div( b m grad b / (1 + |grad b|^2) ), central, no-flux."""
    def grad_c(f):
        gx = np.zeros_like(f); gy = np.zeros_like(f)
        gx[:, 1:-1] = (f[:, 2:] - f[:, :-2]) / (2 * g.dx)
        gy[1:-1, :] = (f[2:, :] - f[:-2, :]) / (2 * g.dy)
        return gx, gy
    bx, by = grad_c(b)
    denom = 1.0 + bx * bx + by * by
    wx = b * m * bx / denom
    wy = b * m * by / denom
    dwx, _ = grad_c(wx)
    _, dwy = grad_c(wy)
    return dwx + dwy


def _melt(g: Grid, diss, b=None, m_prev=None, warburton=True):
    m = (G_FLUX + diss) / LH
    if warburton and b is not None and m_prev is not None:
        m = m + _warburton(g, b, m_prev)
    return m


def _melt_quartic(qmag, N, mdiff=0.0):
    """Exact steady melt from the local melt-gap consistency at frozen
    (q, N): eliminating b = m / (rho_i A N^3) from the dissipation closes
    m as the unique positive root of

        Lh m^4 - (G + Lh mdiff) m^3 - rho_w g q^2 D k^3 = 0,
        D = 12 nu (1 + omega |q|/nu) / g,   k = rho_i A N^3

    (the same elimination as oracle/shmip_oracle.melt_rate, vectorized).
    Solving this EXACTLY is what makes the outer fixed point stable: the
    raw pointwise map b -> b(m(T(b))) has log-slope ~3 where dissipation
    dominates (m ~ b^3 at frozen grad h), which no under-relaxation can
    damp; with q frozen instead, m no longer depends on the local b at
    all.  Vectorized Newton from the provable below-root start
    m0 = max(Geff/Lh, (c/Lh)^(1/4)) (f increasing and convex there)."""
    Geff = G_FLUX + LH * np.asarray(mdiff)
    Geff = np.maximum(Geff, 1e-3 * G_FLUX)   # keep the root positive
    k = RHO_I * A_GLEN * np.maximum(np.abs(N), 1.0) ** N_GLEN
    D = 12.0 * NU * (1.0 + OMEGA * qmag / NU) / G_GRAV
    c = RHO_W * G_GRAV * qmag * qmag * D * k ** 3
    m = np.maximum(Geff / LH, (c / LH) ** 0.25)
    for _ in range(60):
        fv = LH * m ** 4 - Geff * m ** 3 - c
        dfv = 4.0 * LH * m ** 3 - 3.0 * Geff * m ** 2
        step = fv / np.maximum(dfv, 1e-300)
        m = m - step
        if np.max(np.abs(step) / np.maximum(m, 1e-300)) < 1e-14:
            break
    return m


def steady_uniform(case: str, nx=100, ny=1, theta=0.25, max_iters=4000,
                   tol=1e-11, b0=0.01, warburton=True):
    """Damped fixed point for the y-uniform steady state (ny = 1: a
    single row of cells — on channelized cases the y-uniform equilibrium
    can be unstable to y-breakup, so the y-collapsed FV column is the
    robust way to compute the uniform BRANCH, and is still a fully
    independent check of the 1D shooting oracle: FV + exact local
    melt quartic + direct sparse solves vs an LSODA shooting BVP).

    Each iteration solves the elliptic N equation EXACTLY for the lagged
    coefficients — so q is mass-determined (independent of the local b),
    the melt quartic closes m|b pointwise, and the remaining outer map in
    b is weakly contracting under geometric relaxation.

    Returns dict(x, N, b, q, m, iters, resid): x-profiles directly
    comparable to oracle/shmip_oracle.steady_profile.
    """
    g = Grid(nx, ny)
    inp = CASES_A[case]
    N = 0.5 * RHO_I * G_GRAV * g.zs
    b = np.full((ny, nx), b0)
    Re = np.zeros((ny, nx))
    m = np.full((ny, nx), G_FLUX / LH)
    resid = np.inf
    prev = None
    th = theta
    for k in range(max_iters):
        T = _transmissivity(b, Re)
        c_m = 1.0 / RHO_W - 1.0 / RHO_I
        # sources of the head equation div q = m c_m + C + inp (the same
        # convention _column_residual validates against the 1D oracle);
        # the linearized closure C = coef * N moves to the LHS diagonal.
        # Recharge is a SOURCE: rhs = m c_m + inp.  (A `- inp` sign bug
        # here made recharge act as drainage — every cell drained toward
        # the sealed b-floor/N-cap state; the entire family of march
        # pathologies (collapse fronts, dt-floor pinning, N caps) were
        # downstream symptoms.)
        rhs = m * c_m + inp
        coef = np.maximum(A_GLEN * np.maximum(b, B_FLOOR)
                          * np.abs(N) ** (N_GLEN - 1.0), 1e-25)
        N_new = _solve_N(g, T, coef, rhs)
        h, qx, qy, qmag, diss = _fields_from_N(g, N_new, T)
        mdiff = _warburton(g, b, m) if warburton else 0.0
        m_new = _melt_quartic(qmag, N_new, mdiff)
        b_t = m_new / (RHO_I * A_GLEN
                       * np.maximum(np.abs(N_new), 1.0) ** N_GLEN)
        b_t = np.clip(b_t, 1e-8, B_TARGET_MAX)
        if not (np.all(np.isfinite(N_new)) and np.all(np.isfinite(b_t))):
            # diverging relaxation: back off and damp harder
            if prev is None:
                raise FloatingPointError("fv2d fixed point diverged at k=0")
            N, b, m, Re = prev
            th *= 0.5
            continue
        b_new = np.exp((1 - th) * np.log(b) + th * np.log(b_t))
        resid = max(np.max(np.abs(N_new - N)) / max(np.max(np.abs(N)), 1.0),
                    np.max(np.abs(np.log(b_new / b))))
        prev = (N, b, m, Re)
        N, b, m = N_new, b_new, m_new
        Re = qmag / NU
        if resid < tol:
            break
    return {"x": g.x, "N": N.mean(axis=0), "b": b.mean(axis=0),
            "q": qmag.mean(axis=0), "m": m.mean(axis=0),
            "N2d": N, "b2d": b,
            "yspread_N": float(np.max(N.std(axis=0))),
            "iters": k + 1, "resid": float(resid)}


def _column_residual(Nv, logb, g: Grid, inp, mdiff):
    """Coupled steady FV residual on the y-collapsed column (nx cells).

    Unknowns: N (Pa) and log b per cell.  The turbulent drag is resolved
    pointwise through the same stable quadratic root as the framework's
    monolithic solver (design cross-check: two independent codes, same
    closed form):  |q| = 2 s / (1 + sqrt(1 + 4 (omega/nu) s)),
    s = k |grad h|, k = b^3 g / (12 nu).  Margin BC: h = 0 at the x = 0
    face via a linear ghost (h_ghost = -h_0); divide: no flux.
    Returns (R_N, R_b): R_N the cell mass defect [m/s], R_b the gap
    defect db/dt [m/s]."""
    b = np.exp(logb)
    h0c = g.h0[0]                                   # (nx,)
    h = h0c - Nv / (RHO_W * G_GRAV)
    a = OMEGA / NU

    # face head gradients: interior faces + margin ghost face
    dhf = np.empty(g.nx + 1)
    dhf[1:-1] = (h[1:] - h[:-1]) / g.dx             # face i+1/2
    dhf[0] = (h[0] - (-h[0])) / g.dx                # ghost: h=0 at face
    dhf[-1] = 0.0                                   # divide: no flux
    kf = np.empty(g.nx + 1)
    kcell = (np.maximum(b, 1e-10) ** 3) * G_GRAV / (12.0 * NU)
    kf[1:-1] = 2.0 * kcell[1:] * kcell[:-1] / (kcell[1:] + kcell[:-1])
    kf[0] = kcell[0]
    kf[-1] = 0.0
    s = kf * np.abs(dhf)
    qmagf = 2.0 * s / (1.0 + np.sqrt(1.0 + 4.0 * a * s))
    qf = -np.sign(dhf) * qmagf                      # flux in +x [m^2/s]

    # cell dissipation: -rho_w g q . grad h = +rho_w g |q||grad h|,
    # averaged from the two faces
    dissf = RHO_W * G_GRAV * qmagf * np.abs(dhf)
    diss = 0.5 * (dissf[:-1] + dissf[1:])
    m = (G_FLUX + diss) / LH + mdiff
    C = A_GLEN * b * Nv * np.abs(Nv) ** (N_GLEN - 1.0)

    c_m = 1.0 / RHO_W - 1.0 / RHO_I
    R_N = (qf[1:] - qf[:-1]) / g.dx - (m * c_m + C + inp)
    R_b = m / RHO_I - C
    return R_N, R_b


def steady_column_newton(case: str, nx=200, warburton=True, tol=1e-10,
                         max_newton=200, mdiff_refreshes=3, x0=None):
    """Damped Newton on the coupled column system — the conclusive FV
    steady state (no pseudo-time, no fixed-point; measured: every damped
    fixed-point variant either staggers into period-2 N oscillation or
    converges to a spurious clipped state — the same splitting pathology
    that motivates the framework's solve/monolithic.py, reproduced here
    independently).

    FD Jacobian (2 nx unknowns, dense), Armijo backtracking, log-b
    unknowns.  The Warburton m_diff is frozen per Newton solve and
    refreshed ``mdiff_refreshes`` times from the converged iterate (the
    reference's lagged evaluation).  ``x0``: optional (N, b) warm start
    (continuation across the case ladder).  Returns dict like
    steady_uniform plus resid/newton."""
    g = Grid(nx, 1)
    inp = CASES_A[case]
    if x0 is None:
        Nv = 0.3 * RHO_I * G_GRAV * g.zs[0].copy()
        b = np.full(nx, 1e-3)
    else:
        Nv, b = x0[0].copy(), x0[1].copy()
    logb = np.log(b)
    mdiff = np.zeros(nx)
    scale_b = None
    newton_total = 0

    def norm(RN, Rb, sb):
        return np.sqrt(np.sum(RN * RN) + sb * sb * np.sum(Rb * Rb))

    def natural_scales(Nv_, logb_):
        """(nat_N, nat_b) row scales from NATURAL term magnitudes, not
        the entry residual ratio: warm-starting from a converged neighbor
        enters with |R_b| ~ machine-zero and a residual-ratio scale of
        ~1e12, whose merit rejects every Newton step (measured)."""
        b_ = np.exp(logb_)
        C = A_GLEN * b_ * np.abs(Nv_) ** N_GLEN
        m_nat = G_FLUX / LH
        nat_b = max(np.linalg.norm(m_nat / RHO_I + C), 1e-300)
        nat_N = max(np.linalg.norm(np.abs(m_nat * (1 / RHO_W - 1 / RHO_I))
                                   + C + inp), 1e-300)
        return nat_N, nat_b

    # backtracking down to 1e-5: the coupled Newton direction's merit is
    # V-shaped near strong b-N rebalancing (only tiny fractions descend;
    # measured on the framework's monolithic polish too)
    ALPHAS = tuple(10.0 ** (-k / 2.0) for k in range(11))
    r_init = None
    converged = False
    for refresh in range(max(mdiff_refreshes, 1)):
        for it in range(max_newton):
            RN, Rb = _column_residual(Nv, logb, g, inp, mdiff)
            nat_N, nat_b = natural_scales(Nv, logb)
            if scale_b is None:
                scale_b = nat_N / nat_b
            r0 = norm(RN, Rb, scale_b)
            if r_init is None:
                r_init = r0
            if not np.isfinite(r0):
                raise FloatingPointError("column Newton residual non-finite")
            if (np.linalg.norm(RN) < tol ** 0.5 * nat_N
                    and np.linalg.norm(Rb) < tol ** 0.5 * nat_b):
                converged = True
                break
            # FD Jacobian, column by column (2 nx evals, each O(nx))
            n2 = 2 * nx
            J = np.empty((n2, n2))
            R0 = np.concatenate([RN, scale_b * Rb])
            for jcol in range(nx):
                eps = max(abs(Nv[jcol]), 1e3) * 1e-7
                Np_ = Nv.copy(); Np_[jcol] += eps
                rn, rb = _column_residual(Np_, logb, g, inp, mdiff)
                J[:, jcol] = (np.concatenate([rn, scale_b * rb]) - R0) / eps
                eps = 1e-7
                lb_ = logb.copy(); lb_[jcol] += eps
                rn, rb = _column_residual(Nv, lb_, g, inp, mdiff)
                J[:, nx + jcol] = (np.concatenate([rn, scale_b * rb])
                                   - R0) / eps
            du = np.linalg.solve(J, -R0)
            newton_total += 1
            ok = False
            for alpha in ALPHAS:
                N_t = Nv + alpha * du[:nx]
                lb_t = np.clip(logb + alpha * du[nx:],
                               logb - 2.3, logb + 2.3)   # <= one decade
                lb_t = np.clip(lb_t, np.log(1e-8), np.log(10.0))
                rn, rb = _column_residual(N_t, lb_t, g, inp, mdiff)
                if norm(rn, rb, scale_b) < (1 - 1e-4 * alpha) * r0 \
                        and np.all(np.isfinite(rn)):
                    Nv, logb = N_t, lb_t
                    ok = True
                    break
            if not ok:
                break
        if not warburton or not converged:
            break
        # refresh the lagged Warburton term from the converged iterate
        b = np.exp(logb)
        RN, Rb = _column_residual(Nv, logb, g, inp, mdiff)
        m = Rb * RHO_I + RHO_I * A_GLEN * b * Nv * np.abs(Nv) ** 2  # recover m
        md_new = _warburton(g, b[None, :], m[None, :])[0]
        if np.max(np.abs(md_new - mdiff)) < 1e-16:
            break
        mdiff = md_new
        converged = False

    b = np.exp(logb)
    RN, Rb = _column_residual(Nv, logb, g, inp, mdiff)
    # report the drift rate the framework certifies: ||db/dt|| yr / ||b||
    rate = np.linalg.norm(Rb) * 3.1536e7 / max(np.linalg.norm(b), 1e-300)
    return {"x": g.x, "N": Nv, "b": b, "m": (Rb * RHO_I
            + RHO_I * A_GLEN * b * Nv * np.abs(Nv) ** 2),
            "newton": newton_total, "rate_b": float(rate),
            "resN": float(np.linalg.norm(RN)), "converged": bool(converged)}


def solve_ladder(cases=("A1", "A2", "A3", "A4", "A5", "A6"), nx=200,
                 warburton=True, max_ratio=2.5):
    """Solve the suite-A ladder by input continuation: each case warm-
    starts from the previous solution, with geometric input sub-steps of
    at most ``max_ratio`` between solved states (a 20x input jump from a
    converged neighbor sits outside the Newton basin — measured).
    Yields (case, result)."""
    inp_prev = None
    x0 = None
    out = {}
    for case in cases:
        inp = CASES_A[case]
        if inp_prev is not None and inp > inp_prev * max_ratio:
            nsub = int(np.ceil(np.log(inp / inp_prev) / np.log(max_ratio)))
            for ss in range(1, nsub):
                inp_mid = inp_prev * (inp / inp_prev) ** (ss / nsub)
                r = _solve_at_input(inp_mid, nx, warburton, x0)
                if r["converged"]:
                    x0 = (r["N"], r["b"])
        r = _solve_at_input(inp, nx, warburton, x0)
        if r["converged"]:
            x0 = (r["N"], r["b"])
            inp_prev = inp
        out[case] = r

    # retry pass: warm-start any unconverged case from its nearest
    # converged neighbor, with geometric continuation sub-steps in either
    # direction (A1's crude cold start stalls; descending from A2
    # converges it — measured)
    order = list(cases)
    for ci, case in enumerate(order):
        if out[case]["converged"]:
            continue
        donor = None
        for dist in range(1, len(order)):
            for cj in (ci + dist, ci - dist):
                if 0 <= cj < len(order) and out[order[cj]]["converged"]:
                    donor = order[cj]
                    break
            if donor:
                break
        if donor is None:
            continue
        inp_d, inp = CASES_A[donor], CASES_A[case]
        x0 = (out[donor]["N"], out[donor]["b"])
        nsub = max(int(np.ceil(abs(np.log(inp / inp_d))
                               / np.log(max_ratio))), 1)
        okc = True
        for ss in range(1, nsub):
            r = _solve_at_input(inp_d * (inp / inp_d) ** (ss / nsub),
                                nx, warburton, x0)
            if not r["converged"]:
                okc = False
                break
            x0 = (r["N"], r["b"])
        if okc:
            r = _solve_at_input(inp, nx, warburton, x0)
            if r["converged"]:
                out[case] = r
    return out


def _solve_at_input(inp, nx, warburton, x0):
    """steady_column_newton at an arbitrary input rate (continuation
    sub-steps between the published cases)."""
    key = "_CONT"
    CASES_A[key] = inp
    try:
        return steady_column_newton(key, nx=nx, warburton=warburton, x0=x0)
    finally:
        del CASES_A[key]


def _quasi_static_N(g: Grid, b, m_w, inp, N, Re, N_lo, N_hi,
                    max_inner=40, tol=1e-7, theta=0.6):
    """Solve the quasi-static head system self-consistently at frozen
    gap b and frozen Warburton correction m_w: the head equation has no
    time derivative in SHAKTI, so N, Re, and the dissipation melt must
    close TOGETHER at every instant — T depends on Re, Re on the fluxes
    from N, melt on the dissipation, and the rhs on melt.  Damped fixed
    point (theta on N and Re), closure linearized at the current iterate
    so the converged N satisfies the exact signed nonlinear closure
    C = A b N |N|^2.  (The old march lagged Re/m/coef ACROSS steps; the
    accepted N then bounced dt-independently — rejection cannot cure a
    wild quasi-static solve.)  Returns (N, Re, m, fields...) or None if
    the elliptic solve went non-finite."""
    c_m = 1.0 / RHO_W - 1.0 / RHO_I
    m = np.broadcast_to(G_FLUX / LH + np.asarray(m_w),
                        (g.ny, g.nx)).astype(float)
    out = None
    for it in range(max_inner):
        T = _transmissivity(b, Re)
        coef = np.maximum(A_GLEN * np.maximum(b, B_FLOOR)
                          * np.abs(N) ** (N_GLEN - 1.0), 1e-25)
        coef = np.maximum(coef, 1e-14 * coef.max())
        rhs = m * c_m + inp
        with np.errstate(over="ignore", invalid="ignore"):
            N_new = _solve_N(g, T, coef, rhs)
        if not np.all(np.isfinite(N_new)):
            return None
        N_new = np.clip(N_new, N_lo, N_hi)
        N_new = theta * N_new + (1.0 - theta) * N
        h, qx, qy, qmag, diss = _fields_from_N(g, N_new, T)
        gradmag = qmag / np.maximum(T, 1e-300)
        Re_new = theta * _re_selfconsistent(b, gradmag) + (1 - theta) * Re
        m = (G_FLUX + diss) / LH + m_w
        dN = float(np.max(np.abs(N_new - N))) / max(
            float(np.max(np.abs(N_new))), 1.0)
        dRe = float(np.max(np.abs(Re_new - Re))) / max(
            float(np.max(Re_new)), 1.0)
        N, Re = N_new, Re_new
        out = (N, Re, m, qx, qy, qmag)
        if dN < tol and dRe < tol:
            break
    return out


def march(case: str, nx=100, ny=20, years=10.0, dt0=3600.0,
          dt_max=None, seed=0, noise=0.5, b0=0.01, warburton=True,
          max_rel=0.1, save_every=None, verbose=0,
          b_init=None, N_init=None, input_rate=None, sample_times=None,
          sample_mask=None, grid=None, b_cap=None,
          steady_exit_rate=None, rel_pctile=100.0):
    """Pseudo-time march of the PHYSICAL gap dynamics — channelized
    regimes channelize (on this grid, with this discretization,
    independently of the FEM).

    Each step: (1) `_quasi_static_N` closes the instantaneous head
    system (N, Re, melt) exactly at the current gap — the head equation
    is quasi-static in SHAKTI, so it must be CONVERGED per step, not
    lagged (lagged variants bounced dt-independently and collapsed into
    the sealed basin); (2) b advances by a per-cell exponential
    integrator on db/dt = (m/(rho_i b) - cr) b with the bracket frozen
    over the step (unconditionally stable — the explicit melt-opening
    feedback is stiff in collapsing cells).  dt adapts on the LIVE-cell
    relative change: grows 1.3x when < max_rel/4, rejects/halves when
    > max_rel.  Returns y-mean window profiles + the 2D fields.

    TIME-FORCED runs (the suite C/D transient oracle leg, VERDICT r4
    item 3): ``input_rate(t) -> scalar or (ny, nx) array`` replaces the
    constant case input with the instantaneous recharge field at
    physical time t [s] (evaluated at the step start; the quasi-static
    head system has no memory, so this is first-order in dt like the
    gap ODE itself).  The march time axis is PHYSICAL time — dt_max
    must resolve the forcing period (caller's responsibility).
    ``sample_times`` (ascending, seconds): steps land EXACTLY on each
    time (dt is clipped to the next sample boundary) and the mean of N
    over ``sample_mask`` (default: the x in [30, 90] km window, all y)
    is recorded; returned as ``samples`` (len(sample_times),).

    VALLEY runs (the suite E oracle leg): pass ``grid`` (a masked
    variable-geometry Grid, see valley_grid), ``b_cap`` (scalar or
    per-cell gap cap — the framework's VALLEY_B_CAP regularization,
    here a knob so its influence on the certified interior state can be
    measured), and ``steady_exit_rate`` (1/yr: exit once the worst
    live-cell relative gap rate |db/dt|/b falls below it, after at
    least 10% of the horizon — steady-forcing runs stop at steady
    instead of burning the full horizon).
    """
    g = grid if grid is not None else Grid(nx, ny)
    ny, nx = g.ny, g.nx
    rng = np.random.default_rng(seed)
    inp0 = CASES_A[case] if input_rate is None else None
    inp_at = ((lambda t: inp0) if input_rate is None else input_rate)
    if sample_mask is None:
        sample_mask = np.broadcast_to((g.x >= 30e3) & (g.x <= 90e3),
                                      (ny, nx)) if grid is None else g.mask
    sample_mask = sample_mask & g.mask
    sample_times = (np.asarray(sample_times, dtype=float)
                    if sample_times is not None else None)
    samples = []        # window-mean N per sample time
    samples_min = []    # window-min N per sample time (artesian detection)
    N = (np.array(N_init, dtype=float, copy=True) if N_init is not None
         else 0.5 * RHO_I * G_GRAV * g.thick)
    if N.ndim == 1:
        N = np.tile(N, (ny, 1))
    b = (np.array(b_init, dtype=float, copy=True) if b_init is not None
         else b0 * np.exp(noise * rng.standard_normal((ny, nx))))
    if b.ndim == 1:
        b = np.tile(b, (ny, 1))
    if noise and b_init is not None:
        b = b * np.exp(noise * rng.standard_normal((ny, nx)))
    Re = np.zeros((ny, nx))
    m = np.full((ny, nx), G_FLUX / LH)
    dt = dt0
    if dt_max is None:
        dt_max = 50 * 86400.0
    t, T_end = 0.0, years * 3.1536e7
    steps = 0
    min_dt = 1.0
    rejects = 0
    # physical effective-pressure band, PER CELL: 0 <= p_w <= p_i gives
    # N in [0, p_i] with p_i = rho_i g H the local overburden; allow a
    # -p_i/4 artesian excursion (SHAKTI permits transient negative N).
    # The clip engages only in degenerate zones (sealed columns make the
    # linearized elliptic solve locally wild — a GLOBAL 5e7 cap let
    # cells sit at closure rates ~0.3/s, collapse fronts that held the
    # step controller at its floor forever; with the physical band the
    # worst closure rate is A p_i^3 ~ 5e-3/s).  The N-solve is
    # dt-INDEPENDENT, so step rejection cannot cure a wild solve — the
    # clip (plus the relative conditioning floor on the closure
    # coefficient) must.  Overburden is rho_i g H (H = thickness; the
    # suite-A bed is 0 so this is the original rho_i g z_s there).
    N_hi = RHO_I * G_GRAV * g.thick
    N_lo = -0.25 * N_hi
    qmag = np.zeros((ny, nx))
    rate_b_yr = float("inf")
    while t < T_end and steps < 500000:
        inp = inp_at(t)
        # Warburton correction frozen over the step (a small diffusive
        # term of the previous step's melt field; masked to active cells)
        m_w = _warburton(g, b, m) * g.mask if warburton else 0.0
        qs = _quasi_static_N(g, b, m_w, inp, N, Re, N_lo, N_hi)
        if qs is None:
            rejects += 1
            if rejects > 40:
                raise RuntimeError(
                    f"march({case}): quasi-static solve non-finite at "
                    f"t={t / 3.1536e7:.3f} yr")
            # non-finite elliptic solve: re-seed Re from scratch
            Re = np.zeros_like(Re)
            continue
        N_new, Re_new, m_new, qx, qy, qmag = qs
        dt_eff = dt
        if sample_times is not None and len(samples) < sample_times.size:
            # land exactly on the next sample time
            dt_eff = min(dt_eff,
                         max(sample_times[len(samples)] - t, min_dt))
        # SIGNED closure rate (db/dt = m/rho_i - A b N|N|^2, Sommers
        # eq. 2): under negative N (artesian, recharge into a collapsed
        # cell) creep OPENS the gap and reopens it
        cr = A_GLEN * N_new * np.abs(N_new) ** (N_GLEN - 1.0)
        # per-cell exponential integrator on db/dt = g b with the
        # growth rate g = m/(rho_i b) - cr frozen over the step:
        # unconditionally stable and positive (the explicit
        # melt-opening feedback m ~ b^3 is STIFF in collapsing hot
        # cells).  The +-3 exponent clip bounds a fast cell to e^3 per
        # step; such cells equilibrate within a few steps.
        with np.errstate(over="ignore", invalid="ignore"):
            grow = m_new / (RHO_I * np.maximum(b, B_FLOOR)) - cr
            b_new = b * np.exp(np.clip(dt_eff * grow, -3.0, 3.0))
            b_new = np.clip(b_new, B_FLOOR, 1e3)
        if b_cap is not None:
            b_new = np.minimum(b_new, b_cap)
        b_new = np.where(g.mask, b_new, b)       # inactive cells frozen
        # step metric excludes clip-pinned cells (the module-docstring
        # lesson, extended to the cap): a melt-runaway cell LANDING on
        # the cap is where any dt would put it — rel-limiting its climb
        # pins dt at hours forever (measured on the valley: worst-rel
        # cells were all capped/landing, grow ~5e3-1.5e4 /yr)
        live = (b > 1.01 * B_FLOOR) & g.mask
        if b_cap is not None:
            live &= b_new < np.asarray(b_cap) * (1.0 - 1e-9)
        # rel_pctile < 100: control dt on the given percentile of the
        # live-cell relative change instead of the max — a small
        # population of cells flickering about the cap boundary (their
        # steady state is a limit cycle AT the cap, reached in one
        # e^+-3-bounded exponential-integrator jump regardless of dt)
        # otherwise pins dt at minutes forever (measured on the valley:
        # dt sawtoothed 60 <-> 400 s indefinitely).  The integrator is
        # unconditionally stable and positive, so overshooting the
        # tolerated tail is safe; the bulk field stays rel-controlled.
        if live.any():
            relf = np.abs(b_new[live] - b[live]) / b[live]
            rel = float(np.max(relf) if rel_pctile >= 100.0
                        else np.percentile(relf, rel_pctile))
        else:
            rel = 0.0
        bad = not np.all(np.isfinite(b_new))
        if bad or (rel > max_rel and dt_eff > min_dt):
            rejects += 1
            if verbose and rejects % 50 == 0:
                print(f"  march {case}: {rejects} rejects at step {steps} "
                      f"t={t / 3.1536e7:.3f} yr dt={dt_eff:.2e} bad={bad} "
                      f"rel={rel:.2e}", flush=True)
            if rejects > 400:
                raise RuntimeError(
                    f"march({case}): {rejects} consecutive rejected steps "
                    f"at t={t / 3.1536e7:.3f} yr, dt={dt_eff:.3e}")
            # keep the converged quasi-static (N, Re) as the next guess
            N, Re = N_new, Re_new
            dt = max(dt_eff / 2.0, min_dt)
            continue                                # reject, retry smaller
        rejects = 0
        N, Re, b, m = N_new, Re_new, b_new, m_new
        t += dt_eff
        steps += 1
        rate_b_yr = rel / max(dt_eff, 1e-300) * 3.1536e7
        if (steady_exit_rate is not None and t > 0.1 * T_end
                and rate_b_yr < steady_exit_rate):
            break
        while (sample_times is not None and len(samples) < sample_times.size
               and t >= sample_times[len(samples)] - 1e-3):
            samples.append(float(N[sample_mask].mean()))
            samples_min.append(float(N[sample_mask].min()))
        if verbose and steps % verbose == 0:
            print(f"  march {case}: step {steps} t={t / 3.1536e7:.3f} yr "
                  f"dt={dt_eff:.1f} rel={rel:.3f} "
                  f"yspreadN={float(np.max(N.std(axis=0))):.3e} "
                  f"floor={float((b <= 1.01 * B_FLOOR).mean()):.2f}",
                  flush=True)
        # proportional controller targeting rel ~ max_rel/2 (grow-until-
        # reject wasted ~1/4 of the inner solves on rejected steps)
        if rel > 0:
            dt = min(max(dt_eff * min(1.3, max(0.5, 0.5 * max_rel / rel)),
                         min_dt), dt_max)
        else:
            dt = min(dt_eff * 1.3, dt_max)
    return {"x": g.x, "N": N.mean(axis=0), "b": b.mean(axis=0),
            "N2d": N, "b2d": b, "q2d": qmag, "grid": g,
            "yspread_N": float(np.max(N.std(axis=0))),
            "frac_b_floor": float((b[g.mask] <= 1.01 * B_FLOOR).mean()),
            "rate_b_yr": float(rate_b_yr),
            "steps": steps, "t_years": t / 3.1536e7, "dt_final": dt,
            "samples": np.asarray(samples),
            "samples_min": np.asarray(samples_min)}


# --------------------------------------------------------------- valley
# SHMIP suite-E 'bench' valley geometry (de Fleurian et al. 2018 §3.2) —
# the published spec, reimplemented locally so the oracle keeps sharing
# no CODE with the framework (setups/setup_shmip.py implements the same
# published formulas; only the spec is common, like the constants).

VALLEY_LEN = 6e3
PARA_BENCH = 0.05
E_INPUT = 1.158e-6          # [m/s] suite-E steady distributed input


def valley_surface(x):
    return 100.0 * (x + 200.0) ** 0.25 + x / 60.0 - (2e10) ** 0.25 + 1.0


def _valley_f(x, para):
    s6 = valley_surface(VALLEY_LEN)
    return ((s6 - para * VALLEY_LEN) / VALLEY_LEN ** 2) * x ** 2 + para * x


def valley_bed(x, y, para):
    s = valley_surface(x)
    gy = 0.5e-6 * np.abs(y) ** 3
    h = ((-4.5 * x / VALLEY_LEN + 5.0) * (s - _valley_f(x, para))
         / (s - _valley_f(x, PARA_BENCH) + 1e-12))
    return _valley_f(x, para) + gy * h


def valley_half_width(x):
    s = valley_surface(x)
    thick = np.maximum(s - _valley_f(x, PARA_BENCH), 0.0)
    shape = np.maximum(-4.5 * x / VALLEY_LEN + 5.0, 1e-12)
    return (thick / (0.5e-6 * shape)) ** (1.0 / 3.0)


def valley_grid(para, nx=100, ny=24):
    """Masked FV grid of the suite-E valley at bed parameter ``para``.
    The footprint (half-width where thickness -> 0) is para-independent
    by construction — the suite-E design: only the bed deepens."""
    dx = VALLEY_LEN / nx
    x = (np.arange(nx) + 0.5) * dx
    w = valley_half_width(x)
    ly = 2.0 * float(w.max()) * 1.02
    y = -ly / 2.0 + (np.arange(ny) + 0.5) * (ly / ny)
    X, Y = np.meshgrid(x, y)
    zb = valley_bed(X, Y, para)
    zs = np.maximum(valley_surface(X), zb + 1.0)   # >= 1 m of ice inside
    mask = np.abs(Y) <= w[None, :]
    # p_w = 0 at the x = 0 terminus face -> ghost head = the bed there
    margin_h = valley_bed(0.0, y, para)
    return Grid(nx, ny, lx=VALLEY_LEN, ly=ly, y0=-ly / 2.0,
                zs=zs, zb=zb, mask=mask, margin_h=margin_h)


def valley_steady(para, nx=100, ny=24, years=4.0, b_cap=0.5, seed=0,
                  steady_exit_rate=0.05, max_rel=0.1, verbose=0,
                  x0=None):
    """March the valley to its steady state under the suite-E constant
    distributed input and report the suite-E comparison metrics: mean N
    over the footprint, mean N and b in the overdeepened-trough band
    (x in [2, 4] km — the same band scripts/shmip_validate.py reduces
    the framework state over), and the terminus discharge vs source
    budget.  ``b_cap``: per-cell min(ice column, b_cap) like the
    framework's VALLEY_B_CAP regularization (setups/setup_shmip.py) —
    pass a different value to measure the cap's influence on the
    certified interior state (VERDICT r4 item 4).  ``x0``: optional
    (N2d, b2d) warm start (ladder continuation — the footprint is
    para-independent, so a neighboring case's state skips the violent
    cold start, which is most of the march's steps)."""
    g = valley_grid(para, nx, ny)
    cap = np.maximum(np.minimum(g.thick, b_cap), 1e-3)
    m = march(f"E(para={para})", years=years, dt0=3600.0, seed=seed,
              noise=0.0 if x0 is not None else 0.1, b0=0.01,
              N_init=None if x0 is None else x0[0],
              b_init=None if x0 is None else np.minimum(x0[1], cap),
              max_rel=max_rel, verbose=verbose,
              dt_max=6 * 3600.0, rel_pctile=98.0,
              input_rate=lambda t: E_INPUT, grid=g, b_cap=cap,
              steady_exit_rate=steady_exit_rate)
    N2, b2, q2 = m["N2d"], m["b2d"], m["q2d"]
    act = g.mask
    trough = act & (g.x >= 2e3)[None, :] & (g.x <= 4e3)[None, :]
    # terminus discharge through the margin ghost faces vs total source
    # (steady balance check; c_m melt exchange is ~1e-3 of the input)
    h = g.h0 - N2 / (RHO_W * G_GRAV)
    # quadratic-root face flux at the margin ghost faces (the same
    # closure the march's quasi-static solve enforces)
    kf = np.where(act[:, 0],
                  (np.maximum(b2[:, 0], B_FLOOR) ** 3) * G_GRAV
                  / (12.0 * NU), 0.0)
    dhf = (h[:, 0] - g.margin_h) / (g.dx / 2.0)
    s = kf * np.abs(dhf)
    qf = 2.0 * s / (1.0 + np.sqrt(1.0 + 4.0 * (OMEGA / NU) * s))
    Q_out = float(np.sum(qf * np.sign(dhf) * g.dy))
    Q_src = float(E_INPUT * act.sum() * g.area)
    return {"para": para, "grid_nx_ny": [nx, ny],
            "N_mean_MPa": float(N2[act].mean() / 1e6),
            "N_trough_MPa": float(N2[trough].mean() / 1e6),
            "b_trough_mm": float(b2[trough].mean() * 1e3),
            "frac_cap": float((b2[act] >= cap[act] - 1e-12).mean()),
            "Q_out": Q_out, "Q_src": Q_src,
            "imbalance": abs(Q_out - Q_src) / max(abs(Q_src), 1e-30),
            "steps": m["steps"], "t_years": m["t_years"],
            "rate_b_yr": m["rate_b_yr"],
            # 2D fields for cross-run comparisons (cap sensitivity);
            # callers caching to JSON must strip these
            "N2d": N2, "b2d": b2, "mask": act, "thick": g.thick,
            "xc": g.x}


if __name__ == "__main__":
    for case in ("A1", "A3", "A5"):
        p = steady_uniform(case)
        mid = np.searchsorted(p["x"], 50e3)
        print(f"{case}: N(50km) = {p['N'][mid] / 1e6:.3f} MPa, "
              f"b(50km) = {p['b'][mid] * 100:.3f} cm, iters {p['iters']}, "
              f"resid {p['resid']:.2e}, yspread {p['yspread_N']:.2e}")

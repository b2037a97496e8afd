"""SHMIP suite A: the community benchmark for subglacial hydrology models
(de Fleurian et al. 2018, J. Glaciol. — the Subglacial Hydrology Model
Intercomparison Project), run with the SHAKTI physics.

Geometry: the land-terminating 'sqrt' ice-sheet margin on a 100 km x 20 km
rectangle, flat bed, surface

    z_s(x) = 6 (sqrt(x + 5000) - sqrt(5000)) + 1   [m]

Suite A varies a steady uniform distributed water input over six decades
(A1..A6).  The zero-water-pressure margin condition at x = 0 maps to the
SHAKTI outflow Dirichlet N = rho_i g H(0).

The reference repo never ran SHMIP, but the SHAKTI GMD paper (Sommers et
al. 2018, §4) validates against this configuration family; this setup makes
that validation reproducible in-framework (see tests/test_shmip.py for the
physical ordering checks)."""

import os

import numpy as np

from shakti_tpu.api.model import ModelSetup
from shakti_tpu.mesh.generate import rectangle_mesh
from shakti_tpu.params import DEFAULT_PARAMS as P

# SHMIP table 2: suite A steady distributed inputs [m/s]
CASES_A = {
    "A1": 7.93e-11,
    "A2": 1.59e-9,
    "A3": 5.79e-9,
    "A4": 2.5e-8,
    "A5": 4.5e-8,
    "A6": 5.79e-7,
}

# Suite B: surface melt delivered through moulins (de Fleurian et al. 2018
# table 2): n moulins with equal rates summing to the A5-equivalent total
# (4.5e-8 m/s x 100 km x 20 km = 90 m^3/s), on top of the A1 distributed
# basal-melt background.  SHMIP's published moulin coordinate files are not
# redistributable here, so positions are seeded-uniform over the interior
# (documented deviation; the intercomparison metrics used below — global
# conservation, many-moulins -> distributed-limit convergence — are
# position-robust).
CASES_B = {"B1": 1, "B2": 10, "B3": 20, "B4": 50, "B5": 100}
B_TOTAL_M3S = 4.5e-8 * 100e3 * 20e3          # = A5 total, 90 m^3/s

# Suite C: diurnal forcing of the B5 moulin input,
# inputs(t) = inputs * max(0, 1 + Ra sin(2 pi t / day)), with relative
# amplitudes Ra (de Fleurian et al. 2018 §3.1.3).
CASES_C = {"C1": 0.25, "C2": 0.5, "C3": 1.0, "C4": 2.0}
DAY_S = 86400.0


def surface(x):
    return 6.0 * (np.sqrt(x + 5000.0) - np.sqrt(5000.0)) + 1.0


def moulin_positions(n: int, lx: float, ly: float, seed: int = 7):
    """Seeded-uniform moulin coordinates over the interior (margin strip
    x < 10 km excluded: SHMIP moulins sit in the ablation zone, and a
    moulin on the Dirichlet margin would short-circuit the outflow BC)."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(0.1 * lx, 0.95 * lx, size=n)
    y = rng.uniform(0.05 * ly, 0.95 * ly, size=n)
    return np.column_stack([x, y])


def initialize(case: str = "A3", *, nx=100, ny=20, days=365.0, nt_per_day=4,
               results_name=None, seed=0):
    if case not in CASES_A and case not in CASES_B and case not in CASES_C:
        raise ValueError(f"unknown SHMIP case '{case}' (suites A, B, C)")
    lx, ly = 100e3, 20e3
    nodes, cells = rectangle_mesh(nx, ny, lx, ly)
    md = ModelSetup(nodes, cells)
    md.setup_name = f"setup_shmip_{case}"
    md.setup_file = os.path.abspath(__file__)
    md.results_name = results_name

    md.z_b = np.zeros(md.x.size)
    md.z_s = surface(md.x)
    md.G = np.full(md.x.size, 0.05)
    if case in CASES_A:
        md.inputs = np.full(md.x.size, CASES_A[case])
    else:
        # suites B/C: A1 distributed background + equal-rate moulins
        # (md.add_moulin lumps each discharge onto the nearest node)
        n_moulin = CASES_B[case] if case in CASES_B else CASES_B["B5"]
        md.inputs = np.full(md.x.size, CASES_A["A1"])
        for xy in moulin_positions(n_moulin, lx, ly):
            md.add_moulin(xy, B_TOTAL_M3S / n_moulin)
        if case in CASES_C:
            md.seasonal_inputs = (CASES_C[case], DAY_S, 0.0)
    md.storage_on = False

    # margin at x = 0: zero water pressure -> N = overburden of the ~1 m
    # terminus (SHMIP boundary condition mapped to SHAKTI variables)
    md.N_bdry = P.rho_i * P.g * (surface(0.0) - 0.0)
    md.OutflowBoundary = lambda p: p[:, 0] < 1e-6
    md.outflow_on = True

    rng = np.random.default_rng(seed)
    md.b_init = 0.01 + rng.normal(scale=1e-3, size=md.x.size)
    md.N_init = np.full(md.x.size, 1e5)

    t_final = (days / 365.0) * 3.154e7
    md.timesteps = np.linspace(0.0, t_final, int(days * nt_per_day))
    md.nt_save = nt_per_day
    md.nt_check = 50 * md.nt_save
    return md

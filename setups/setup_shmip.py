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


def surface(x):
    return 6.0 * (np.sqrt(x + 5000.0) - np.sqrt(5000.0)) + 1.0


def initialize(case: str = "A3", *, nx=100, ny=20, days=365.0, nt_per_day=4,
               results_name=None, seed=0):
    lx, ly = 100e3, 20e3
    nodes, cells = rectangle_mesh(nx, ny, lx, ly)
    md = ModelSetup(nodes, cells)
    md.setup_name = f"setup_shmip_{case}"
    md.setup_file = os.path.abspath(__file__)
    md.results_name = results_name

    md.z_b = np.zeros(md.x.size)
    md.z_s = surface(md.x)
    md.G = np.full(md.x.size, 0.05)
    md.inputs = np.full(md.x.size, CASES_A[case])
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

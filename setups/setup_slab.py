"""Tilted-slab experiment: the GMD benchmark geometry
(BASELINE.json configs[0-1]; Sommers et al. 2018 test case family).

A uniformly sloping bed under uniform-thickness ice, outflow Dirichlet on the
downstream edge, a single moulin at the domain center.  Follows the setup
contract of the reference (setups/setup_cooke2.py:14-100): a module-level
``initialize()`` returning a ready-to-solve model object.
"""

import os

import numpy as np

from shakti_tpu.api.model import ModelSetup
from shakti_tpu.mesh.generate import rectangle_mesh


def initialize(nx=60, ny=60, lx=10e3, ly=10e3, *,
               bed_slope=0.02, thickness=500.0, moulin_Q=2.0,
               days=30.0, nt_per_day=24, results_name=None, seed=0):
    nodes, cells = rectangle_mesh(nx, ny, lx, ly)
    md = ModelSetup(nodes, cells)

    md.setup_name = "setup_slab"
    md.setup_file = os.path.abspath(__file__)
    md.lake_name = None
    md.results_name = results_name

    # geometry: bed rising in +x, uniform ice thickness
    md.z_b = bed_slope * md.x
    md.z_s = md.z_b + thickness
    md.G = np.full(md.x.size, 0.05)          # 50 mW/m^2 geothermal flux

    # head decreases toward x = 0 -> outflow on the x = 0 edge
    md.N_bdry = 1.0e5
    md.OutflowBoundary = lambda p: p[:, 0] < 1e-6 * lx + 1e-9
    md.outflow_on = True
    md.storage_on = False                    # no lake in the slab case

    # single moulin at the domain center
    if moulin_Q:
        md.add_moulin((lx / 2, ly / 2), moulin_Q)

    # initial conditions (deterministic seed; cf. reference setup_cooke2.py:66
    # which draws unseeded noise)
    rng = np.random.default_rng(seed)
    md.b_init = 0.001 + rng.normal(scale=0.0005, size=md.x.size)
    md.N_init = np.full(md.x.size, md.N_bdry)

    t_final = (days / 365.0) * 3.154e7
    md.timesteps = np.linspace(0, t_final, int(days * nt_per_day))
    md.nt_save = nt_per_day
    md.nt_check = 50 * md.nt_save
    return md

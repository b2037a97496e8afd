"""Synthetic subglacial-lake filling/draining experiment
(BASELINE.json configs[2]: lake recharge + storage + outflow BCs).

A closed bed depression under sloping ice creates a hydraulic-potential low
that traps water; a distributed seasonal recharge fills it, and the outflow
Dirichlet boundary drains the catchment.  Post-processing derives the lake
level from the lake-mean effective pressure exactly like the reference's
notebooks (solution-plots.ipynb cell 12: level = -d<N>/(rho_w g))
via shakti_tpu.post.lake_level.
"""

import os

import numpy as np

from shakti_tpu.api.model import ModelSetup
from shakti_tpu.mesh.generate import rectangle_mesh
from shakti_tpu.params import DEFAULT_PARAMS as P


def initialize(nx=48, ny=48, lx=40e3, ly=40e3, *, days=180.0, nt_per_day=12,
               lake_radius=6e3, recharge=3.17e-9,  # ~0.1 m/yr distributed
               results_name=None, seed=0):
    nodes, cells = rectangle_mesh(nx, ny, lx, ly, jitter=0.2, seed=seed)
    md = ModelSetup(nodes, cells)
    md.setup_name = "setup_lake"
    md.setup_file = os.path.abspath(__file__)
    md.lake_name = "synthetic_lake"
    md.results_name = results_name

    cx, cy = 0.55 * lx, 0.5 * ly
    r2 = ((md.x - cx) ** 2 + (md.y - cy) ** 2) / lake_radius ** 2
    md.z_b = 0.003 * md.x - 80.0 * np.exp(-r2)       # depression under the lake
    md.z_s = md.z_b * 0.0 + 1200.0 + 0.004 * md.x    # ~1.2 km of ice
    md.G = np.full(md.x.size, 0.06)

    # circular lake outline at the depression
    th = np.linspace(0, 2 * np.pi, 121)
    md.set_lake_bdry(np.column_stack([cx + lake_radius * np.cos(th),
                                      cy + lake_radius * np.sin(th)]))
    md.storage_on = True

    # outflow where the background potential is lowest (x = 0 side here)
    from shakti_tpu.physics.constitutive import background_potential
    import jax.numpy as jnp
    pot = np.asarray(background_potential(jnp.asarray(md.z_b),
                                          jnp.asarray(md.z_s), P))
    P_min, P_std = float(pot.min()), float(pot.std())

    def potential_at(p):
        # analytic re-evaluation at arbitrary boundary points
        r2p = ((p[:, 0] - cx) ** 2 + (p[:, 1] - cy) ** 2) / lake_radius ** 2
        zb = 0.003 * p[:, 0] - 80.0 * np.exp(-r2p)
        zs = 1200.0 + 0.004 * p[:, 0]
        return P.rho_w * P.g * (zb + (P.rho_i / P.rho_w) * (zs - zb))

    md.OutflowBoundary = lambda p: np.abs(potential_at(p) - P_min) < 0.5 * P_std
    md.outflow_on = True
    md.N_bdry = 2.0e5

    # distributed recharge everywhere (fills the lake through the sheet)
    md.inputs = np.full(md.x.size, recharge)

    rng = np.random.default_rng(seed)
    md.b_init = 0.001 + rng.normal(scale=0.0005, size=md.x.size)
    md.N_init = np.full(md.x.size, md.N_bdry)

    t_final = (days / 365) * 3.154e7
    md.timesteps = np.linspace(0, t_final, int(days * nt_per_day))
    md.nt_save = nt_per_day
    md.nt_check = 30 * md.nt_save
    return md

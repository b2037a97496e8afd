"""SHMIP suite A physical-structure checks (de Fleurian et al. 2018).

Full steady-state profile comparison is a long-horizon (multi-year,
sub-hourly) run better done on TPU; here we verify the robust early-time
physics on a coarse mesh: convergence, boundary condition, and the
monotone response of the water sheet to recharge over 4 decades of input.
"""

import jax
import numpy as np

import setups.setup_shmip as shmip
from shakti_tpu.solve.timestep import make_step_fn, run_window, timestep_sizes


def run_case(case, days=180.0, nt_per_day=4):
    md = shmip.initialize(case, nx=50, ny=10, days=days, nt_per_day=nt_per_day)
    mesh, static, state, cfg = md.freeze()
    step = make_step_fn(mesh, static, md.params, cfg)
    dts = timestep_sizes(md.timesteps, dtype=md.dtype)
    s, d = jax.jit(lambda a, b: run_window(step, a, b))(state, dts)
    assert bool(np.asarray(d["converged"]).all()), case
    return md, s


def test_shmip_suite_a_structure():
    results = {c: run_case(c) for c in ("A1", "A3", "A5")}

    b_mean = {c: float(np.asarray(s.b).mean()) for c, (md, s) in results.items()}
    # more recharge -> thicker water sheet (monotone over 4 decades of input)
    assert b_mean["A1"] < b_mean["A3"] < b_mean["A5"], b_mean

    for c, (md, s) in results.items():
        N = np.asarray(s.N)
        assert np.isfinite(N).all()
        # margin Dirichlet honored
        dmask = np.zeros(md.x.size, dtype=bool)
        dmask[md.dirichlet_nodes()] = True
        np.testing.assert_allclose(N[dmask], md.N_bdry, rtol=1e-6)
        # interior effective pressure within glaciologically sane bounds
        band = (md.x > 20e3) & (md.x < 80e3)
        assert -1e6 < N[band].mean() < 5e6, (c, N[band].mean())

    # surface function matches the SHMIP definition at the margin and divide
    assert abs(shmip.surface(0.0) - 1.0) < 1e-9
    assert 1400.0 < shmip.surface(100e3) < 1900.0

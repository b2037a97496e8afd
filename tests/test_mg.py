"""Multilevel (aggregation V-cycle) preconditioner tests (solve/mg.py):
Galerkin-product exactness, solver equivalence, iteration behavior, and the
distributed (halo) path — the PETSc-MG role (reference solvers.py:51-54)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import setups.setup_slab as slab
from shakti_tpu.physics import residual as res
from shakti_tpu.solve.mg import build_hierarchy, assemble_levels
from shakti_tpu.solve.timestep import make_step_fn, run_window, timestep_sizes


def _problem(nx=24, ny=24, **solver_kw):
    md = slab.initialize(nx=nx, ny=ny, days=1.0, nt_per_day=4)
    md.b_init = np.full(md.x.size, 0.01)
    md.solver = dataclasses.replace(md.solver, adaptive_dt_levels=0,
                                    **solver_kw)
    return md


def _element_blocks(md):
    mesh, static, state, cfg = md.freeze()
    dts = timestep_sizes(md.timesteps, dtype=md.dtype)
    pre = res.precompute_step(mesh, state.N, state.b, state.q, state.melt,
                              static, dts[0], md.params, cfg.quad_degree)
    J_c = res.element_jacobian(state.N, pre, mesh, md.params)
    return mesh, static, J_c


def test_hierarchy_galerkin_products_are_exact():
    """Every level's ELL operator must equal the explicit Galerkin triple
    product P^T A P for piecewise-constant aggregation of the free dofs."""
    md = _problem(nx=24, ny=24, precond="mg", mg_agg=4, mg_coarse_cap=16)
    mesh, static, J_c = _element_blocks(md)
    n = mesh.n_nodes
    plan = mesh.mg
    assert plan is not None and len(plan.cols) >= 2   # forces real levels

    dirichlet = static.dirichlet
    levels, A_inv = assemble_levels(J_c, mesh, dirichlet, plan)

    # dense fine operator restricted to free rows/cols
    free = (~np.asarray(dirichlet)).astype(np.float64)
    A = np.zeros((n, n))
    Jc = np.asarray(J_c)
    cells = np.asarray(mesh.cells)
    for c in range(cells.shape[0]):
        for i in range(3):
            for j in range(3):
                A[cells[c, i], cells[c, j]] -= Jc[c, i, j] \
                    * free[cells[c, i]] * free[cells[c, j]]

    agg = plan.agg
    m_prev, A_prev = n, A
    for l, (V, d) in enumerate(levels):
        m, K = plan.cols[l].shape
        P = np.zeros((m_prev, m))
        P[np.arange(m_prev), np.arange(m_prev) // agg] = 1.0
        A_l = P.T @ A_prev @ P
        # ELL -> dense
        got = np.zeros((m, m))
        cols = np.asarray(plan.cols[l])
        vals = np.asarray(V)
        for r in range(m):
            for k in range(K):
                got[r, cols[r, k]] += vals[r, k]
        np.testing.assert_allclose(got, A_l, rtol=1e-12, atol=1e-9 * np.abs(A_l).max())
        # diagonal extraction
        np.testing.assert_allclose(np.asarray(d), np.diag(A_l), rtol=1e-12,
                                   atol=1e-9 * np.abs(A_l).max())
        m_prev, A_prev = m, A_l

    # dense coarse = Galerkin of the last ELL level (up to the 1e-8 reg)
    m_c = plan.m_c
    P = np.zeros((m_prev, m_c))
    P[np.arange(m_prev), np.arange(m_prev) // agg] = 1.0
    A_c = P.T @ A_prev @ P
    got_inv = np.asarray(A_inv)
    reg = 1e-8 * np.abs(np.diag(A_c)).mean()
    np.testing.assert_allclose(np.linalg.inv(A_c + reg * np.eye(m_c)),
                               got_inv, rtol=1e-5)


def test_mg_solution_matches_two_level():
    """precond='mg' must converge to the same trajectory as 'two_level'
    (the preconditioner changes the iteration path, not the solution)."""
    outs = {}
    for pc in ("two_level", "mg"):
        md = _problem(nx=24, ny=24, precond=pc, mg_agg=4, mg_coarse_cap=16)
        mesh, static, state, cfg = md.freeze()
        if pc == "mg":
            assert mesh.mg is not None and len(mesh.mg.cols) >= 1
        step = make_step_fn(mesh, static, md.params, cfg)
        dts = timestep_sizes(md.timesteps, dtype=md.dtype)[:4]
        s, d = jax.jit(lambda a, b: run_window(step, a, b))(state, dts)
        assert bool(np.asarray(d["converged"]).all()), pc
        outs[pc] = (md.to_user_order(np.asarray(s.N)),
                    int(np.asarray(d["cg_iters"]).sum()))
    np.testing.assert_allclose(outs["mg"][0], outs["two_level"][0], rtol=1e-7)


def test_mg_beats_jacobi_iteration_count():
    """On a mesh with a deep hierarchy the V-cycle must cut CG iterations
    hard relative to Jacobi (the whole point of the multilevel PC)."""
    counts = {}
    for pc, kw in (("jacobi", {}),
                   ("mg", dict(mg_agg=4, mg_coarse_cap=16))):
        md = _problem(nx=40, ny=40, precond=pc, **kw)
        mesh, static, state, cfg = md.freeze()
        step = make_step_fn(mesh, static, md.params, cfg)
        dts = timestep_sizes(md.timesteps, dtype=md.dtype)[:2]
        s, d = jax.jit(lambda a, b: run_window(step, a, b))(state, dts)
        assert bool(np.asarray(d["converged"]).all()), pc
        counts[pc] = int(np.asarray(d["cg_iters"]).sum())
    assert counts["mg"] < 0.5 * counts["jacobi"], counts


def test_mg_degenerates_gracefully_on_tiny_mesh():
    """Below the coarse cap build_hierarchy returns None and the solver
    silently uses the two-level path."""
    md = _problem(nx=8, ny=8, precond="mg")
    mesh, static, state, cfg = md.freeze()
    assert mesh.mg is None
    step = make_step_fn(mesh, static, md.params, cfg)
    dts = timestep_sizes(md.timesteps, dtype=md.dtype)[:2]
    s, d = jax.jit(lambda a, b: run_window(step, a, b))(state, dts)
    assert bool(np.asarray(d["converged"]).all())


def test_mg_cheb_smoother_matches_jacobi_solution():
    """smoother='cheb' (degree-2 Chebyshev sweeps) must converge to the
    same trajectory as the damped-Jacobi V-cycle, without blowing up the
    CG iteration count (the Gershgorin lmax bound must be safe)."""
    outs = {}
    for sm in ("jacobi", "cheb"):
        md = _problem(nx=40, ny=40, precond="mg", mg_agg=4,
                      mg_coarse_cap=16, mg_smoother=sm)
        mesh, static, state, cfg = md.freeze()
        assert mesh.mg is not None
        step = make_step_fn(mesh, static, md.params, cfg)
        dts = timestep_sizes(md.timesteps, dtype=md.dtype)[:3]
        s, d = jax.jit(lambda a, b: run_window(step, a, b))(state, dts)
        assert bool(np.asarray(d["converged"]).all()), sm
        outs[sm] = (md.to_user_order(np.asarray(s.N)),
                    int(np.asarray(d["cg_iters"]).sum()))
    np.testing.assert_allclose(outs["cheb"][0], outs["jacobi"][0], rtol=1e-7)
    assert outs["cheb"][1] <= 1.5 * outs["jacobi"][1], outs


def test_mg_wcycle_matches_vcycle_solution():
    """cycle='w' (symmetric double correction per coarse level) must reach
    the same trajectory as the V-cycle without costing more CG iterations
    (the W-cycle is a strictly stronger coarse solve; equality is allowed —
    at shallow hierarchies the V-cycle is already near-exact)."""
    outs = {}
    for cyc in ("v", "w"):
        md = _problem(nx=40, ny=40, precond="mg", mg_agg=4,
                      mg_coarse_cap=16, mg_cycle=cyc)
        mesh, static, state, cfg = md.freeze()
        assert mesh.mg is not None and len(mesh.mg.cols) >= 2
        step = make_step_fn(mesh, static, md.params, cfg)
        dts = timestep_sizes(md.timesteps, dtype=md.dtype)[:3]
        s, d = jax.jit(lambda a, b: run_window(step, a, b))(state, dts)
        assert bool(np.asarray(d["converged"]).all()), cyc
        outs[cyc] = (md.to_user_order(np.asarray(s.N)),
                     int(np.asarray(d["cg_iters"]).sum()))
    np.testing.assert_allclose(outs["w"][0], outs["v"][0], rtol=1e-7)
    assert outs["w"][1] <= outs["v"][1] + 2, outs


def test_distributed_mg_cheb_matches_single_device():
    """The halo-path Chebyshev V-cycle (psum'd offabs assembly, pmax'd
    Gershgorin bound) must reproduce the single-device cheb trajectory."""
    from shakti_tpu.parallel.dist import gather_state, make_distributed_runner
    from shakti_tpu.parallel.shard import make_device_mesh

    def build():
        return _problem(nx=32, ny=32, precond="mg", mg_agg=4,
                        mg_coarse_cap=16, mg_smoother="cheb")

    md1 = build()
    mesh, static, state, cfg = md1.freeze()
    step = make_step_fn(mesh, static, md1.params, cfg)
    dts = timestep_sizes(md1.timesteps, dtype=md1.dtype)[:3]
    s1, d1 = jax.jit(lambda a, b: run_window(step, a, b))(state, dts)
    assert bool(np.asarray(d1["converged"]).all())
    N1 = md1.to_user_order(np.asarray(s1.N))

    md2 = build()
    md2.distributed = True
    runner, st0, plan = make_distributed_runner(md2, make_device_mesh(4))
    s2, d2 = runner(st0, dts)
    assert bool(np.asarray(d2["converged"]).all())
    g = gather_state(plan, s2)
    N2 = np.asarray(g.N)[md2.node_iperm]
    np.testing.assert_allclose(N1, N2, rtol=1e-8)


def test_distributed_mg_wcycle_matches_single_device():
    """The halo-path W-cycle (double correction over the replicated coarse
    hierarchy) must reproduce the single-device W-cycle trajectory — the
    second correction adds level matvecs but no new communication, so
    SPMD consistency must be preserved."""
    from shakti_tpu.parallel.dist import gather_state, make_distributed_runner
    from shakti_tpu.parallel.shard import make_device_mesh

    def build():
        return _problem(nx=32, ny=32, precond="mg", mg_agg=4,
                        mg_coarse_cap=16, mg_cycle="w")

    md1 = build()
    mesh, static, state, cfg = md1.freeze()
    step = make_step_fn(mesh, static, md1.params, cfg)
    dts = timestep_sizes(md1.timesteps, dtype=md1.dtype)[:3]
    s1, d1 = jax.jit(lambda a, b: run_window(step, a, b))(state, dts)
    assert bool(np.asarray(d1["converged"]).all())
    N1 = md1.to_user_order(np.asarray(s1.N))

    md2 = build()
    md2.distributed = True
    runner, st0, plan = make_distributed_runner(md2, make_device_mesh(4))
    s2, d2 = runner(st0, dts)
    assert bool(np.asarray(d2["converged"]).all())
    g = gather_state(plan, s2)
    N2 = np.asarray(g.N)[md2.node_iperm]
    np.testing.assert_allclose(N1, N2, rtol=1e-8)


@pytest.mark.parametrize("ndev", [4])
def test_distributed_mg_matches_single_device(ndev):
    """The halo-path multilevel PC (psum'd level-1 assembly, replicated
    hierarchy) must reproduce the single-device mg trajectory."""
    from shakti_tpu.parallel.dist import gather_state, make_distributed_runner
    from shakti_tpu.parallel.shard import make_device_mesh

    def build():
        md = _problem(nx=32, ny=32, precond="mg", mg_agg=4, mg_coarse_cap=16)
        return md

    md1 = build()
    mesh, static, state, cfg = md1.freeze()
    assert mesh.mg is not None and len(mesh.mg.cols) >= 1
    step = make_step_fn(mesh, static, md1.params, cfg)
    dts = timestep_sizes(md1.timesteps, dtype=md1.dtype)[:3]
    s1, d1 = jax.jit(lambda a, b: run_window(step, a, b))(state, dts)
    assert bool(np.asarray(d1["converged"]).all())
    N1 = md1.to_user_order(np.asarray(s1.N))

    md2 = build()
    md2.distributed = True
    jmesh = make_device_mesh(ndev)
    runner, st0, plan = make_distributed_runner(md2, jmesh)
    assert plan["mg_plan"] is not None
    s2, d2 = runner(st0, dts)
    assert bool(np.asarray(d2["converged"]).all())
    g = gather_state(plan, s2)
    N2 = np.asarray(g.N)[md2.node_iperm]
    np.testing.assert_allclose(N1, N2, rtol=1e-8)
    # the distributed V-cycle must not cost materially more iterations
    cg1 = int(np.asarray(d1["cg_iters"]).sum())
    cg2 = int(np.asarray(d2["cg_iters"]).sum())
    assert cg2 <= 1.5 * cg1 + 8, (cg1, cg2)


def test_mg_smoothed_prolongation_matches_tentative():
    """mg_smooth_p>0 (hybrid smoothed-aggregation fine transfers, exact
    transpose pair) must converge to the same trajectory as tentative
    transfers — the cycle stays a fixed SPD operator, so plain CG remains
    valid — without costing more CG iterations (the smoothed coarse
    subspace is strictly richer)."""
    outs = {}
    for spv in (0.0, 4.0 / 3.0):
        md = _problem(nx=40, ny=40, precond="mg", mg_agg=4,
                      mg_coarse_cap=16, mg_smooth_p=spv)
        mesh, static, state, cfg = md.freeze()
        assert mesh.mg is not None
        step = make_step_fn(mesh, static, md.params, cfg)
        dts = timestep_sizes(md.timesteps, dtype=md.dtype)[:3]
        s, d = jax.jit(lambda a, b: run_window(step, a, b))(state, dts)
        assert bool(np.asarray(d["converged"]).all()), spv
        outs[spv] = (md.to_user_order(np.asarray(s.N)),
                     int(np.asarray(d["cg_iters"]).sum()))
    np.testing.assert_allclose(outs[4.0 / 3.0][0], outs[0.0][0], rtol=1e-7)
    assert outs[4.0 / 3.0][1] <= outs[0.0][1] + 2, outs


def test_distributed_mg_smoothed_p_matches_single_device():
    """The halo-path smoothed-P transfers (fine matvecs inside restrict/
    prolong do their own halo exchange; the Gershgorin w_p is pmax'd
    identical on every shard) must reproduce the single-device smoothed-P
    trajectory."""
    from shakti_tpu.parallel.dist import gather_state, make_distributed_runner
    from shakti_tpu.parallel.shard import make_device_mesh

    def build():
        return _problem(nx=32, ny=32, precond="mg", mg_agg=4,
                        mg_coarse_cap=16, mg_smooth_p=4.0 / 3.0)

    md1 = build()
    mesh, static, state, cfg = md1.freeze()
    step = make_step_fn(mesh, static, md1.params, cfg)
    dts = timestep_sizes(md1.timesteps, dtype=md1.dtype)[:3]
    s1, d1 = jax.jit(lambda a, b: run_window(step, a, b))(state, dts)
    assert bool(np.asarray(d1["converged"]).all())
    N1 = md1.to_user_order(np.asarray(s1.N))

    md2 = build()
    md2.distributed = True
    runner, st0, plan = make_distributed_runner(md2, make_device_mesh(4))
    s2, d2 = runner(st0, dts)
    assert bool(np.asarray(d2["converged"]).all())
    g = gather_state(plan, s2)
    N2 = np.asarray(g.N)[md2.node_iperm]
    np.testing.assert_allclose(N1, N2, rtol=1e-8)

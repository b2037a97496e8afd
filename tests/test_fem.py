"""FEM core tests: assembly vs direct numpy stiffness, AD Jacobian vs finite
differences, and a method-of-manufactured-solutions convergence study
(SURVEY §4 consequence items 1-2)."""

import jax
import jax.numpy as jnp
import numpy as np

from shakti_tpu.fem import ops
from shakti_tpu.mesh.generate import rectangle_mesh
from shakti_tpu.mesh.mesh import build_mesh, cell_geometry
from shakti_tpu.params import DEFAULT_PARAMS
from shakti_tpu.physics import residual as res
from shakti_tpu.solve.newton import NewtonConfig, newton_solve
from shakti_tpu.solve.timestep import make_static_fields


def poisson_problem(nx, jitter=0.0):
    """SHAKTI residual degenerated to a pure Poisson operator:
    flat geometry, constant b, zero frozen flux/melt, closure off."""
    nodes, cells = rectangle_mesh(nx, nx, 1.0, 1.0, jitter=jitter, seed=3)
    mesh = build_mesh(nodes, cells, dtype=jnp.float64)
    n = nodes.shape[0]
    p = DEFAULT_PARAMS.replace(A=0.0)
    zeros = np.zeros(n)
    static = make_static_fields(mesh, zeros, zeros, zeros, zeros, zeros,
                                np.zeros(n, dtype=bool), 0.0, 1e-5, p)
    b0 = 1e-3
    pre = res.precompute_step(
        mesh, jnp.zeros(n), jnp.full(n, b0), jnp.zeros((n, 2)), jnp.zeros(n),
        static, jnp.asarray(1.0), p, quad_degree=2)
    coeff = b0 ** 3 * p.g / (12 * p.nu) / (p.rho_w * p.g)
    return nodes, cells, mesh, static, pre, p, coeff


def numpy_stiffness(nodes, cells):
    area, grads = cell_geometry(nodes, cells)
    n = nodes.shape[0]
    K = np.zeros((n, n))
    for c in range(cells.shape[0]):
        ke = np.abs(area[c]) * grads[c] @ grads[c].T
        for i in range(3):
            for j in range(3):
                K[cells[c, i], cells[c, j]] += ke[i, j]
    return K


def test_residual_matches_numpy_stiffness():
    nodes, cells, mesh, static, pre, p, coeff = poisson_problem(6, jitter=0.2)
    K = numpy_stiffness(nodes, cells)
    rng = np.random.default_rng(0)
    N = rng.normal(size=nodes.shape[0])
    # F_i = -int q_w . grad(phi_i) with q_w = (T/(rho_w g)) grad(N)
    # => residual = -coeff * K N
    r = np.asarray(res.assemble_residual(jnp.asarray(N), pre, mesh, p))
    np.testing.assert_allclose(r, -coeff * K @ N, rtol=1e-10, atol=1e-18)


def test_element_jacobian_vs_finite_differences():
    """Full nonlinear residual (closure + storage + melt terms on) linearized
    by AD must match central finite differences."""
    nodes, cells = rectangle_mesh(3, 3, 1.0, 1.0, jitter=0.1, seed=4)
    mesh = build_mesh(nodes, cells, dtype=jnp.float64)
    n = nodes.shape[0]
    p = DEFAULT_PARAMS
    rng = np.random.default_rng(1)
    static = make_static_fields(
        mesh, rng.normal(size=n), rng.normal(size=n) + 500,
        np.full(n, 0.05), np.zeros(n), np.ones(n),
        np.zeros(n, dtype=bool), 0.0, 1e-5, p)
    N_n = 1e5 + 1e4 * rng.normal(size=n)
    b = np.abs(1e-3 + 1e-4 * rng.normal(size=n))
    q = 1e-4 * rng.normal(size=(n, 2))
    melt = 1e-7 * np.abs(rng.normal(size=n))
    pre = res.precompute_step(mesh, jnp.asarray(N_n), jnp.asarray(b),
                              jnp.asarray(q), jnp.asarray(melt),
                              static, jnp.asarray(3600.0), p, quad_degree=4)
    N = jnp.asarray(N_n + 1e3 * rng.normal(size=n))
    J_c = res.element_jacobian(N, pre, mesh, p)

    # assemble dense J from element blocks
    J = np.zeros((n, n))
    cells_np = np.asarray(mesh.cells)
    Jc = np.asarray(J_c)
    for c in range(cells_np.shape[0]):
        for i in range(3):
            for j in range(3):
                J[cells_np[c, i], cells_np[c, j]] += Jc[c, i, j]

    f = lambda x: np.asarray(res.assemble_residual(jnp.asarray(x), pre, mesh, p))
    eps = 1.0  # Pa; residual is smooth in N at this scale
    J_fd = np.zeros((n, n))
    N_np = np.asarray(N)
    for k in range(n):
        dN = np.zeros(n)
        dN[k] = eps
        J_fd[:, k] = (f(N_np + dN) - f(N_np - dN)) / (2 * eps)
    scale = np.abs(J_fd).max()
    np.testing.assert_allclose(J / scale, J_fd / scale, atol=1e-7)


def mms_error(nx):
    """Manufactured solution N* = N0 + dN sin(pi x) sin(pi y) on the unit
    square, whole-boundary Dirichlet; returns relative L2 error."""
    nodes, cells, mesh, static, pre, p, coeff = poisson_problem(nx, jitter=0.0)
    n = nodes.shape[0]
    N0, dN = 1e5, 1e4
    x, y = nodes[:, 0], nodes[:, 1]
    N_exact = N0 + dN * np.sin(np.pi * x) * np.sin(np.pi * y)
    inputs = coeff * (-2 * np.pi ** 2) * dN * np.sin(np.pi * x) * np.sin(np.pi * y)

    from shakti_tpu.mesh import geometry as geo
    dmask = geo.dirichlet_mask(n, geo.boundary_nodes(cells))
    static = make_static_fields(mesh, np.zeros(n), np.zeros(n), np.zeros(n),
                                inputs, np.zeros(n), dmask, N0, 1e-5, p)
    pre = res.precompute_step(
        mesh, jnp.zeros(n), jnp.full(n, 1e-3), jnp.zeros((n, 2)), jnp.zeros(n),
        static, jnp.asarray(1.0), p, quad_degree=2)
    cfg = NewtonConfig(lin_rtol=1e-12)
    N, stats = newton_solve(jnp.full(n, N0), pre, mesh, static.dirichlet,
                            static.N_bdry, p, cfg)
    assert bool(stats["converged"])
    w = np.asarray(mesh.node_area) / 3.0  # lumped nodal areas
    err = np.asarray(N) - N_exact
    return np.sqrt(np.sum(w * err ** 2) / np.sum(w * N_exact ** 2))


def test_mms_convergence_second_order():
    e1, e2 = mms_error(8), mms_error(16)
    rate = np.log2(e1 / e2)
    assert e2 < e1
    assert rate > 1.8, f"expected O(h^2) convergence, got rate {rate:.2f}"


def test_cell_to_node_avg_exact_for_constants():
    nodes, cells = rectangle_mesh(5, 5, 1.0, 1.0, jitter=0.2, seed=5)
    mesh = build_mesh(nodes, cells, dtype=jnp.float64)
    out = ops.cell_to_node_avg(mesh, jnp.full(mesh.n_cells, 3.25))
    np.testing.assert_allclose(np.asarray(out), 3.25, rtol=1e-13)


def test_cell_grad_exact_for_linear_fields():
    nodes, cells = rectangle_mesh(5, 5, 1.0, 1.0, jitter=0.2, seed=6)
    mesh = build_mesh(nodes, cells, dtype=jnp.float64)
    f = jnp.asarray(2.0 * nodes[:, 0] - 0.5 * nodes[:, 1] + 1.0)
    g = np.asarray(ops.cell_grad(mesh, f))
    np.testing.assert_allclose(g[:, 0], 2.0, atol=1e-12)
    np.testing.assert_allclose(g[:, 1], -0.5, atol=1e-12)


def test_coarse_from_values_matches_element_path():
    """The scatter-free Galerkin coarse build (precond.coarse_from_values,
    r5) must reproduce coarse_inverse's element-scatter result in every
    row-storage format — same sum regrouped per stored nonzero."""
    from shakti_tpu.solve import precond as pc
    from shakti_tpu.physics import residual as resm

    nodes, cells = rectangle_mesh(12, 12, 1.0, 1.0, jitter=0.3, seed=11)
    rng = np.random.default_rng(7)
    J_c = jnp.asarray(rng.normal(size=(cells.shape[0], 3, 3)))
    dirichlet = jnp.asarray(nodes[:, 0] < 1e-9)
    blk = 32
    # blk % B == 0 (whole blocks per aggregate), B % blk == 0 (the
    # sub-tile path, e.g. bench-scale bell-128 with 64-node aggregates)
    for op, B in (("ell", 128), ("bell", 16), ("bcsr", 16),
                  ("bell", 128), ("bcsr", 64)):
        mesh = build_mesh(nodes, cells, dtype=jnp.float64, operator=op,
                          bell_block=B)
        assert pc.vals_coarse_ok(mesh, blk), op
        vals = resm.fold_operator_values(J_c, mesh)
        A1 = np.asarray(pc.coarse_inverse(J_c, mesh, dirichlet, blk))
        A2 = np.asarray(pc.coarse_from_values(vals, mesh, dirichlet, blk))
        np.testing.assert_allclose(A2, A1, rtol=1e-9, atol=1e-12,
                                   err_msg=f"{op}-B{B}")
    # non-divisible aggregate size is refused for block formats
    mesh = build_mesh(nodes, cells, dtype=jnp.float64, operator="bcsr",
                      bell_block=16)
    assert not pc.vals_coarse_ok(mesh, 24)


def test_incidence_accumulate_matches_segment_sum(monkeypatch):
    """Sentinel-style inc_map gather accumulation == the segment_sum path
    (same sums, scatter-free), for 1-column and k-column contributions."""
    nodes, cells = rectangle_mesh(9, 9, 1.0, 1.0, jitter=0.4, seed=2)
    monkeypatch.setenv("SHAKTI_INC_LIMIT", "0")
    mesh_off = build_mesh(nodes, cells, dtype=jnp.float64)
    monkeypatch.setenv("SHAKTI_INC_LIMIT", "1000000")
    mesh_on = build_mesh(nodes, cells, dtype=jnp.float64)
    assert mesh_off.inc_map is None and mesh_on.inc_map is not None
    assert mesh_on.inc_mask is None          # sentinel style carries no mask
    rng = np.random.default_rng(3)
    c1 = jnp.asarray(rng.normal(size=(cells.shape[0], 3)))
    ck = jnp.asarray(rng.normal(size=(cells.shape[0], 3, 2)))
    for contrib in (c1, ck):
        a = np.asarray(ops.scatter_add_cells(mesh_off, contrib))
        b = np.asarray(ops.scatter_add_cells(mesh_on, contrib))
        np.testing.assert_allclose(b, a, rtol=1e-12, atol=1e-14)


def test_residual_multi_columns_bitexact_vs_single():
    """assemble_residual_multi (hand-batched trailing-k corner physics,
    r5 — NOT a vmap, see corner_residual_multi docstring) must reproduce
    each column of assemble_residual bit-for-bit: every reduction keeps
    the single-column shape/order per k-slice."""
    nodes, cells = rectangle_mesh(5, 4, 1.0, 0.8, jitter=0.2, seed=7)
    mesh = build_mesh(nodes, cells, dtype=jnp.float64)
    n = nodes.shape[0]
    p = DEFAULT_PARAMS
    rng = np.random.default_rng(11)
    static = make_static_fields(
        mesh, rng.normal(size=n), rng.normal(size=n) + 500,
        np.full(n, 0.05), np.zeros(n), np.ones(n),
        np.zeros(n, dtype=bool), 0.0, 1e-5, p)
    pre = res.precompute_step(
        mesh, jnp.asarray(1e5 + 1e4 * rng.normal(size=n)),
        jnp.asarray(np.abs(1e-3 + 1e-4 * rng.normal(size=n))),
        jnp.asarray(1e-4 * rng.normal(size=(n, 2))),
        jnp.asarray(1e-7 * np.abs(rng.normal(size=n))),
        static, jnp.asarray(3600.0), p, quad_degree=4)
    cols = [1e5 + 1e4 * rng.normal(size=n) for _ in range(3)]
    Ns = jnp.asarray(np.stack(cols, axis=1))
    multi = np.asarray(res.assemble_residual_multi(Ns, pre, mesh, p))
    for k in range(3):
        single = np.asarray(res.assemble_residual(Ns[:, k], pre, mesh, p))
        np.testing.assert_array_equal(multi[:, k], single,
                                      err_msg=f"column {k}")

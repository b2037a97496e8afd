"""ELL operator format: must reproduce the cell-based assembled operator."""

import jax.numpy as jnp
import numpy as np

from shakti_tpu.fem import ell as ellm
from shakti_tpu.fem import ops
from shakti_tpu.fem.ops import ein
from shakti_tpu.mesh.generate import rectangle_mesh
from shakti_tpu.mesh.mesh import build_mesh


def test_ell_matvec_matches_cell_matvec():
    nodes, cells = rectangle_mesh(7, 5, 1.0, 1.0, jitter=0.2, seed=9)
    mesh = build_mesh(nodes, cells, dtype=jnp.float64)
    n = mesh.n_nodes
    rng = np.random.default_rng(3)
    J_c = jnp.asarray(rng.normal(size=(mesh.n_cells, 3, 3)))
    x = jnp.asarray(rng.normal(size=n))

    # reference: scatter-based product
    xc = x[mesh.cells]
    y_ref = ops.scatter_add_cells(mesh, ein("cij,cj->ci", J_c, xc))

    K = mesh.ell_cols.shape[1]
    vals = ellm.ell_from_elements(J_c, mesh.ell_map, n, K)
    y = ellm.ell_matvec(vals, mesh.ell_cols, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-12)


def test_ell_diag_matches_assembled_diag():
    nodes, cells = rectangle_mesh(6, 6, 1.0, 1.0, jitter=0.1, seed=11)
    mesh = build_mesh(nodes, cells, dtype=jnp.float64)
    n = mesh.n_nodes
    rng = np.random.default_rng(4)
    J_c = jnp.asarray(rng.normal(size=(mesh.n_cells, 3, 3)))

    from shakti_tpu.physics.residual import jacobian_diag
    d_ref = jacobian_diag(J_c, mesh)
    K = mesh.ell_cols.shape[1]
    vals = ellm.ell_from_elements(J_c, mesh.ell_map, n, K)
    d = ellm.ell_diag(vals, mesh.ell_diag_slot)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), rtol=1e-12)


def test_ell_padding_slots_are_inert():
    nodes, cells = rectangle_mesh(4, 4, 1.0, 1.0)
    mesh = build_mesh(nodes, cells, dtype=jnp.float64)
    n, K = mesh.ell_cols.shape
    # a matrix of all ones: row sums must equal (#unique neighbors incl self)
    vals = ellm.ell_from_elements(jnp.ones((mesh.n_cells, 3, 3)),
                                  mesh.ell_map, n, K)
    y = ellm.ell_matvec(vals, mesh.ell_cols, jnp.ones(n))
    cols_np = np.asarray(mesh.ell_cols)
    # padding points at self but contributes zero: y_i = sum of contributions
    assert np.all(np.asarray(y) > 0)
    # interior node of structured mesh: 6 cells x both-in-cell pairs
    # (exact counts checked via the dense reference product)
    dense = np.zeros((n, n))
    cells_np = np.asarray(mesh.cells)
    for c in range(cells_np.shape[0]):
        for i in range(3):
            for j in range(3):
                dense[cells_np[c, i], cells_np[c, j]] += 1.0
    np.testing.assert_allclose(np.asarray(y), dense @ np.ones(n), rtol=1e-12)

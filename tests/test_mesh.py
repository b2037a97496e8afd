"""Mesh layer tests: geometry tables, boundary topology, point-in-polygon."""

import numpy as np
import jax.numpy as jnp

from shakti_tpu.mesh import geometry as geo
from shakti_tpu.mesh.generate import rectangle_mesh
from shakti_tpu.mesh.mesh import build_mesh, cell_geometry


def test_single_triangle_geometry():
    nodes = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    cells = np.array([[0, 1, 2]], dtype=np.int32)
    area, grads = cell_geometry(nodes, cells)
    assert np.isclose(area[0], 0.5)
    # grad(phi_0) = (-1, -1), grad(phi_1) = (1, 0), grad(phi_2) = (0, 1)
    np.testing.assert_allclose(grads[0], [[-1, -1], [1, 0], [0, 1]], atol=1e-14)


def test_partition_of_unity_gradients():
    nodes, cells = rectangle_mesh(5, 7, 2.0, 3.0, jitter=0.2, seed=1)
    _, grads = cell_geometry(nodes, cells)
    # gradients of P1 basis sum to zero in every cell
    np.testing.assert_allclose(grads.sum(axis=1), 0.0, atol=1e-12)


def test_total_area():
    nodes, cells = rectangle_mesh(8, 6, 4.0, 3.0, jitter=0.25, seed=2)
    area, _ = cell_geometry(nodes, cells)
    assert np.isclose(np.abs(area).sum(), 12.0)


def test_boundary_edges_square():
    nodes, cells = rectangle_mesh(4, 4, 1.0, 1.0)
    be = geo.boundary_edges(cells)
    assert be.shape[0] == 16  # 4 edges per side
    bn = geo.boundary_nodes(cells)
    assert bn.size == 16      # 4*5 - 4 duplicates


def test_locate_boundary_nodes_edge_predicate():
    nodes, cells = rectangle_mesh(4, 4, 1.0, 1.0)
    left = geo.locate_boundary_nodes(nodes, cells, lambda p: p[:, 0] < 1e-9)
    assert left.size == 5
    assert np.allclose(nodes[left][:, 0], 0.0)


def test_locate_boundary_requires_full_facet():
    # a predicate true at exactly one node selects no facet (both endpoints
    # must pass, matching dolfinx locate_entities_boundary semantics)
    nodes, cells = rectangle_mesh(4, 4, 1.0, 1.0)
    only_corner = lambda p: (p[:, 0] < 1e-9) & (p[:, 1] < 1e-9)
    sel = geo.locate_boundary_nodes(nodes, cells, only_corner)
    assert sel.size == 0


def test_points_in_polygon_square():
    poly = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], dtype=float)
    pts = np.array([[1, 1], [3, 1], [-0.5, 1], [1.5, 1.99]])
    np.testing.assert_array_equal(
        geo.points_in_polygon(pts, poly), [True, False, False, True])


def test_points_in_multipolygon_nan_broken():
    poly = np.array([[0, 0], [1, 0], [1, 1], [0, 1],
                     [np.nan, np.nan],
                     [3, 3], [4, 3], [4, 4], [3, 4]])
    pts = np.array([[0.5, 0.5], [3.5, 3.5], [2.0, 2.0]])
    np.testing.assert_array_equal(
        geo.points_in_polygon(pts, poly), [True, True, False])


def test_build_mesh_padding_is_inert():
    nodes, cells = rectangle_mesh(3, 3, 1.0, 1.0)
    m1 = build_mesh(nodes, cells, dtype=jnp.float64)
    m2 = build_mesh(nodes, cells, dtype=jnp.float64, n_cells_pad=cells.shape[0] + 7)
    assert m2.n_cells == cells.shape[0] + 7
    np.testing.assert_allclose(np.asarray(m1.node_area), np.asarray(m2.node_area))
    f = jnp.arange(m1.n_nodes, dtype=jnp.float64)
    from shakti_tpu.fem import ops
    r1 = ops.cell_to_node_avg(m1, ops.cell_grad(m1, f)[:, 0])
    r2 = ops.cell_to_node_avg(m2, ops.cell_grad(m2, f)[:, 0])
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-12)

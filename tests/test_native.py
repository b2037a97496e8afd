"""Native C++ engine (csrc/) vs numpy fallbacks: bit-identical results.

Skipped when the library is not built (make -C csrc)."""

import os

import numpy as np
import pytest

from shakti_tpu import native
from shakti_tpu.mesh.generate import rectangle_mesh

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _numpy_mode():
    """Context: force the numpy fallbacks inside library code."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        saved = native._LIB
        native._LIB = None
        try:
            yield
        finally:
            native._LIB = saved
    return ctx()


@pytest.fixture
def mesh_data():
    return rectangle_mesh(17, 13, 3.0, 2.0, jitter=0.22, seed=42)


def test_rcb_order_identical(mesh_data):
    nodes, _ = mesh_data
    from shakti_tpu.parallel.partition import rcb_order
    a = rcb_order(nodes)
    with _numpy_mode():
        b = rcb_order(nodes)
    np.testing.assert_array_equal(a, b)


def test_rcb_partition_identical(mesh_data):
    nodes, _ = mesh_data
    from shakti_tpu.parallel.partition import rcb_partition
    for parts in (2, 3, 8):
        a = rcb_partition(nodes, parts)
        with _numpy_mode():
            b = rcb_partition(nodes, parts)
        np.testing.assert_array_equal(a, b)


def test_boundary_edges_identical(mesh_data):
    _, cells = mesh_data
    from shakti_tpu.mesh.geometry import boundary_edges
    a = boundary_edges(cells)
    with _numpy_mode():
        b = boundary_edges(cells)
    np.testing.assert_array_equal(a, b)


def test_points_in_polygon_identical():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-2, 6, size=(500, 2))
    poly = np.array([[0, 0], [4, 0], [4, 3], [2, 1.5], [0, 3],
                     [np.nan, np.nan],
                     [5, 5], [6, 5], [6, 6], [5, 6]])
    from shakti_tpu.mesh.geometry import points_in_polygon
    a = points_in_polygon(pts, poly)
    with _numpy_mode():
        b = points_in_polygon(pts, poly)
    np.testing.assert_array_equal(a, b)


def test_ell_build_identical(mesh_data):
    nodes, cells = mesh_data
    from shakti_tpu.fem.ell import build_ell_map
    a = build_ell_map(cells, nodes.shape[0])
    with _numpy_mode():
        b = build_ell_map(cells, nodes.shape[0])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_bell_build_identical(mesh_data):
    nodes, cells = mesh_data
    from shakti_tpu.fem.bell import build_block_ell
    a = build_block_ell(cells, nodes.shape[0], 16)
    with _numpy_mode():
        b = build_block_ell(cells, nodes.shape[0], 16)
    assert a[3] == b[3]
    for x, y in zip(a[:3], b[:3]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_bilinear_identical():
    x = np.linspace(0, 4, 13)
    y = np.linspace(-2, 2, 9)
    rng = np.random.default_rng(1)
    f = rng.normal(size=(9, 13))
    from shakti_tpu.data.interp import GridInterpolator
    itp = GridInterpolator(x, y, f)
    px = rng.uniform(-1, 5, 200)     # includes out-of-range (clamped)
    py = rng.uniform(-3, 3, 200)
    a = itp(px, py)
    with _numpy_mode():
        b = itp(px, py)
    np.testing.assert_allclose(a, b, rtol=0, atol=1e-15)


def test_bcsr_build_identical(mesh_data):
    nodes, cells = mesh_data
    from shakti_tpu.fem.bcsr import build_bcsr
    a = build_bcsr(cells, nodes.shape[0], 16)
    with _numpy_mode():
        b = build_bcsr(cells, nodes.shape[0], 16)
    assert a[-1] == b[-1]
    for x, y in zip(a[:-1], b[:-1]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

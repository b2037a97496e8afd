"""Data adapters, msh IO, lake inventory, and post-processing reductions."""

import numpy as np
import pytest

from shakti_tpu.data.interp import GridInterpolator, subset_grid
from shakti_tpu.data import lakes
from shakti_tpu.mesh.generate import rectangle_mesh
from shakti_tpu.mesh.msh_io import read_msh, write_msh
from shakti_tpu import post


def test_grid_interpolator_bilinear_exact():
    x = np.linspace(0, 4, 9)
    y = np.linspace(-1, 3, 7)
    X, Y = np.meshgrid(x, y)
    f = 2.0 * X - 3.0 * Y + 0.5          # bilinear interp is exact on planes
    itp = GridInterpolator(x, y, f)
    rng = np.random.default_rng(0)
    px = rng.uniform(0, 4, 50)
    py = rng.uniform(-1, 3, 50)
    np.testing.assert_allclose(itp(px, py), 2 * px - 3 * py + 0.5, rtol=1e-12)


def test_grid_interpolator_descending_axes():
    x = np.linspace(0, 4, 9)
    y = np.linspace(-1, 3, 7)
    X, Y = np.meshgrid(x, y)
    f = X + 10 * Y
    a = GridInterpolator(x, y, f)(1.3, 0.7)
    b = GridInterpolator(x[::-1], y[::-1], f[::-1, ::-1][:, ::-1][::-1]
                         [::-1, :][:, :][::-1, ::-1])(1.3, 0.7)
    # simpler: descending copy
    c = GridInterpolator(x[::-1], y, f[:, ::-1])(1.3, 0.7)
    np.testing.assert_allclose(a, c, rtol=1e-12)


def test_subset_grid():
    x = np.arange(10.0)
    y = np.arange(6.0)
    f = np.outer(y, x)
    xs, ys, fs = subset_grid(x, y, f, [2, 5, 1, 4])
    assert xs.tolist() == [2, 3, 4, 5]
    assert ys.tolist() == [1, 2, 3, 4]
    assert fs.shape == (4, 4)
    assert fs[0, 0] == 2.0


def test_msh_roundtrip(tmp_path):
    nodes, cells = rectangle_mesh(5, 4, 2.0, 1.0, jitter=0.15, seed=2)
    p = str(tmp_path / "m.msh")
    write_msh(p, nodes, cells)
    nodes2, cells2 = read_msh(p)
    np.testing.assert_allclose(nodes2, nodes, rtol=1e-15)
    np.testing.assert_array_equal(cells2, cells)


def test_lake_inventory_npz_roundtrip(tmp_path):
    th = np.linspace(0, 2 * np.pi, 60)
    outline = np.column_stack([3 * np.cos(th), 3 * np.sin(th)])  # km
    inv = {"TestLake": {"outline": outline, "area_km2": 0.0, "cite": ""}}
    p = str(tmp_path / "inv.npz")
    lakes.save_inventory_npz(p, inv)
    inv2 = lakes.load_inventory(p)
    assert "TestLake" in inv2
    # planar area of a radius-3 km circle
    assert inv2["TestLake"]["area_km2"] == pytest.approx(np.pi * 9, rel=1e-2)
    m = lakes.outline_m(inv2, "TestLake")
    assert np.abs(m).max() == pytest.approx(3000.0, rel=1e-6)


def test_dofs_to_serial_permutation():
    rng = np.random.default_rng(1)
    nodes = rng.uniform(0, 1000, size=(50, 2))
    perm = rng.permutation(50)
    mapped = post.dofs_to_serial(nodes[perm], nodes)
    np.testing.assert_array_equal(perm[mapped], np.arange(50))


def test_lake_level_and_filling_rate():
    t = np.linspace(0, 1e6, 11)
    n = 30
    mask = np.zeros(n, dtype=bool)
    mask[:10] = True
    # N decreasing linearly in the lake -> level rising linearly
    N = np.full((11, n), 1e5) - 9810.0 * t[:, None] * 1e-6 * mask[None, :]
    lvl = post.lake_level(N, mask)
    np.testing.assert_allclose(lvl, 1e-6 * t, rtol=1e-9)
    rate = post.filling_rate(t, N, mask)
    assert rate == pytest.approx(1e-6, rel=1e-9)


def test_far_field_ratio():
    N = np.full((3, 8), 3.6e5)
    mask = np.ones(8, dtype=bool)
    assert post.far_field_ratio(N, mask, 3.7e5) == pytest.approx(0.973, abs=1e-3)


def test_setup_cooke2_synthetic_runs():
    """The production setup must initialize + step without real datasets."""
    import setups.setup_cooke2 as sc
    md = sc.initialize(days=0.5, nt_per_day=4, results_name=None)
    assert md.lake_bdry.sum() > 10          # lake mask nonempty
    assert md.dirichlet_nodes().size > 0    # outflow detected
    from shakti_tpu.api.run import solve
    out = solve(md, progress=False)
    assert np.isfinite(out["history"]["N"]).all()


def test_setup_lake_runs_and_fills():
    import setups.setup_lake as sl
    from shakti_tpu.api.run import solve
    md = sl.initialize(nx=20, ny=20, days=10.0, nt_per_day=4)
    out = solve(md, progress=False)
    lvl = post.lake_level(out["history"]["N"], md.lake_bdry > 0.5)
    assert np.isfinite(lvl).all()


def test_setup_cooke2_with_msh_mesh_dir(tmp_path, monkeypatch):
    """SHAKTI_MESH_DIR + a gmsh file routes through the .msh reader."""
    from shakti_tpu.mesh.generate import polygon_mesh
    from shakti_tpu.mesh.msh_io import write_msh

    th = np.linspace(0, 2 * np.pi, 50, endpoint=False)
    outline = np.column_stack([50e3 + 30e3 * np.cos(th),
                               50e3 + 25e3 * np.sin(th)])
    nodes, cells = polygon_mesh(outline, resolution=5e3)
    write_msh(str(tmp_path / "Cook_E2_mesh.msh"), nodes, cells)
    monkeypatch.setenv("SHAKTI_MESH_DIR", str(tmp_path))

    import setups.setup_cooke2 as sc
    md = sc.initialize(days=0.5, nt_per_day=4, results_name=None)
    assert md.x.size == nodes.shape[0]
    from shakti_tpu.api.run import solve
    out = solve(md, progress=False)
    assert np.isfinite(out["history"]["N"]).all()


def test_operator_cells_path_matches_ell():
    import setups.setup_slab as sl
    from shakti_tpu.api.run import solve

    md1 = sl.initialize(nx=8, ny=8, days=1.0, nt_per_day=4)
    md1.operator = "ell"
    out1 = solve(md1, progress=False)
    md2 = sl.initialize(nx=8, ny=8, days=1.0, nt_per_day=4)
    md2.operator = "none"     # bare cell-based operator
    out2 = solve(md2, progress=False)
    np.testing.assert_allclose(out1["history"]["N"], out2["history"]["N"],
                               rtol=1e-10)


def test_render_frames_six_panels(tmp_path):
    """The movie frames must be the reference's 6-panel composition
    (solution-plots.ipynb cell 12): 3 maps + 3 time-series rows, with
    the lake-level panel when storage is on."""
    import os
    nt = 8
    t = np.linspace(0, 8 * 86400.0, nt)
    n = 25
    x, y = np.meshgrid(np.linspace(0, 4e3, 5), np.linspace(0, 4e3, 5))
    rng = np.random.default_rng(0)
    res = {"t": t, "nodes_x": x.ravel(), "nodes_y": y.ravel(),
           "N": 1e5 + 1e3 * rng.random((nt, n)),
           "b": 1e-3 + 1e-4 * rng.random((nt, n)),
           "qx": 1e-5 * rng.random((nt, n)), "qy": np.zeros((nt, n))}
    lake = np.zeros(n, bool)
    lake[:5] = True
    out = post.render_frames(res, str(tmp_path / "frames"),
                             lake_mask=lake, storage_on=True,
                             outflow_mask=lake)
    assert out["panels"] == 6
    assert out["frames"] == nt
    assert len(os.listdir(tmp_path / "frames")) == nt
    # no-storage branch (mean-N panel) renders too
    out2 = post.render_frames(res, str(tmp_path / "f2"), every=nt)
    assert out2 == {"frames": 1, "panels": 6}

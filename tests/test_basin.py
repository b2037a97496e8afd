"""Drainage-basin pipeline tests (mesh/basin.py) on synthetic potential
fields with analytically known catchments — the automated replacement for
reference create_mesh.ipynb cells 8-17."""

import numpy as np
import pytest

from shakti_tpu.mesh import basin


def _two_valley_grid(n=81):
    """Two catchments with point outlets P1=(0.25, 0), P2=(0.75, 0) and an
    analytic divide at x = 0.5 (unit square).

    phi = min(|r - P1|, |r - P2|): every cell left of the divide descends
    monotonically to P1, so the basin of a lake in the left catchment must
    exclude the right one.  (A plain tilted-plane field would NOT work:
    D8 on a constant slope drains each column to its own border pixel.)
    """
    x = np.linspace(0.0, 1.0, n)
    y = np.linspace(0.0, 1.0, n)
    X, Y = np.meshgrid(x, y)
    phi = 2.0 * np.minimum(np.hypot(X - 0.25, Y), np.hypot(X - 0.75, Y))
    return x, y, phi, X, Y


def test_fill_sinks_raises_depressions_monotone():
    x, y, phi, X, Y = _two_valley_grid(41)
    # carve a closed depression
    phi2 = phi.copy()
    phi2[15:20, 8:13] -= 5.0
    filled = basin.fill_sinks(phi2)
    assert np.all(filled >= phi2 - 1e-12)
    # untouched where no depression
    assert np.allclose(filled[30:, :], phi2[30:, :])
    # after filling, every cell reaches the border by strict descent
    nxt = basin.d8_flow(filled)
    labels, outlets = basin.drainage_basins(nxt)
    oi, oj = np.unravel_index(outlets, phi.shape)
    on_border = (oi == 0) | (oi == phi.shape[0] - 1) | \
                (oj == 0) | (oj == phi.shape[1] - 1)
    assert on_border.all()


def test_flow_accumulation_conserves_cells():
    x, y, phi, X, Y = _two_valley_grid(41)
    nxt = basin.d8_flow(basin.fill_sinks(phi))
    acc = basin.flow_accumulation(nxt)
    n = phi.size
    assert acc.min() >= 1.0
    # total upslope area at the outlets equals the full grid
    labels, outlets = basin.drainage_basins(nxt)
    assert acc[outlets].sum() == pytest.approx(n)
    # the flow funnels: the outlets collect everything, off-spoke
    # mid-slope cells stay small
    acc2 = acc.reshape(phi.shape)
    assert acc2.max() > n / 3
    assert acc2[32, 4] < n / 50


def test_basin_separates_valleys():
    x, y, phi, X, Y = _two_valley_grid(81)
    lake_mask = (np.hypot(X - 0.25, Y - 0.6) < 0.08)
    outline = basin.basin_outline(x, y, phi, lake_mask=lake_mask)
    assert outline.shape[0] >= 3
    from shakti_tpu.mesh.geometry import points_in_polygon
    # lake is inside the basin outline
    lake_pts = np.column_stack([X[lake_mask], Y[lake_mask]])
    assert points_in_polygon(lake_pts, outline).mean() > 0.95
    # the right valley floor is NOT in the basin
    right = np.column_stack([np.full(20, 0.75), np.linspace(0.1, 0.9, 20)])
    assert points_in_polygon(right, outline).sum() == 0
    # basin is bounded by the ridge: no point beyond x ~ 0.5 + one cell
    assert outline[:, 0].max() <= 0.5 + 2 * (x[1] - x[0])


def test_basin_mesh_end_to_end_runs_steps():
    """potential grid -> automated outline -> mesh -> 10 transient steps."""
    x, y, phi, X, Y = _two_valley_grid(81)
    lake_mask = (np.hypot(X - 0.25, Y - 0.6) < 0.08)
    # scale the unit square up to km so the physics is in its usual regime
    L = 40e3
    nodes, cells, outline = basin.basin_mesh(
        x * L, y * L, phi, lake_mask=lake_mask, resolution=1500.0)
    assert nodes.shape[0] > 100
    assert cells.min() >= 0 and cells.max() < nodes.shape[0]

    from shakti_tpu.api.model import ModelSetup
    from shakti_tpu.api.run import solve

    md = ModelSetup(nodes, cells)
    md.z_b = 0.002 * md.x
    md.z_s = md.z_b + 800.0
    md.G = np.full(md.x.size, 0.06)
    md.N_bdry = 1e5
    md.OutflowBoundary = lambda p: p[:, 1] < 1e-3 * L
    md.b_init = np.full(md.x.size, 0.01)
    md.N_init = np.full(md.x.size, 1e5)
    md.timesteps = np.linspace(0, 10 * 3600.0, 11)
    md.nt_save = 5
    out = solve(md, progress=False)
    assert np.isfinite(np.asarray(out["state"].N)).all()
    assert np.isfinite(out["history"]["N"]).all()


def test_quantize_matches_reference_roundtrip():
    x, y, phi, X, Y = _two_valley_grid(31)
    q = basin.background_potential(phi / 9.81 / 917.0, np.zeros_like(phi),
                                   quantize=255)
    assert q.min() == 0.0 and q.max() == 255.0
    assert np.all(q == np.floor(q))


def test_simplify_polygon_square_staircase():
    # staircase approximating a square collapses to ~4 corners
    t = np.linspace(0, 2 * np.pi, 400, endpoint=False)
    sq = np.column_stack([np.round(np.cos(t) * 20) / 20,
                          np.round(np.sin(t) * 20) / 20])
    out = basin.simplify_polygon(sq, tol=0.08)
    assert 3 <= out.shape[0] < 40
    # max deviation from the original ring stays bounded
    from shakti_tpu.mesh.geometry import points_in_polygon
    assert points_in_polygon(np.array([[0.0, 0.0]]), out).all()


def test_basin_mesh_from_geotiff_fixture(tmp_path):
    """The raster leg of the reference mesh workflow (create_mesh.ipynb
    cells 8-11): normalize the potential to uint8, round-trip it through
    a GeoTIFF ON DISK, and drive the drainage-basin mesher from the
    values read back — the quantized raster, not the float grid."""
    from shakti_tpu.data.geotiff import (quantize_potential, read_geotiff,
                                         write_geotiff)
    from shakti_tpu.mesh import basin

    n = 160
    L = 40e3
    x = np.linspace(-L, L, n)
    y = np.linspace(-L, L, n)
    X, Y = np.meshgrid(x, y)
    z_s = 800.0 + 0.01 * np.hypot(X + L, Y)   # single outlet at (-L, 0)
    z_b = np.zeros_like(z_s)
    phi = basin.background_potential(z_s, z_b)

    tif = str(tmp_path / "potential.tif")
    dx = float(x[1] - x[0])
    write_geotiff(tif, quantize_potential(phi)[::-1], west=x.min() - dx / 2,
                  north=y.max() + dx / 2, dx=dx, dy=dx, epsg=3031)

    xt, yt, p8, meta = read_geotiff(tif)
    assert p8.dtype == np.uint8 and meta["epsg"] == 3031
    # north-up raster -> ascending-y grid; the round trip restores the
    # original orientation exactly
    yt, p8 = yt[::-1], p8[::-1]
    np.testing.assert_allclose(xt, x, atol=1e-6)
    np.testing.assert_allclose(yt, y, atol=1e-6)
    np.testing.assert_array_equal(p8, quantize_potential(phi))

    lake = np.column_stack([-10e3 + 6e3 * np.cos(np.linspace(0, 2 * np.pi, 33)),
                            6e3 * np.sin(np.linspace(0, 2 * np.pi, 33))])
    nodes, cells, outline = basin.basin_mesh(
        xt, yt, p8.astype(np.float64), lake_outline=lake, resolution=4000.0)
    assert nodes.shape[0] > 50 and cells.shape[0] > 50
    assert outline.shape[0] >= 4        # simplified catchment polygon
    # the lake centroid lies inside the meshed catchment
    from shakti_tpu.mesh.geometry import points_in_polygon
    assert points_in_polygon(np.array([[-10e3, 0.0]]), outline)[0]


def test_geotiff_reader_rejects_georeference_free_tiff(tmp_path):
    from PIL import Image

    from shakti_tpu.data.geotiff import read_geotiff
    Image.fromarray(np.zeros((4, 4), np.uint8)).save(tmp_path / "p.tif")
    with pytest.raises(ValueError, match="georeferencing"):
        read_geotiff(str(tmp_path / "p.tif"))

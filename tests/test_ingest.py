"""Real-data ingestion exercised with tiny fixture files (VERDICT r1 item 7).

Builds in-test netCDF-4 (= HDF5) files following the BedMachine / ATL14 /
AQ1 conventions (reference setup_cooke2.py:39-62) and a Siegfried &
Fricker-style lake-outline HDF5 (reference load_lakes.py:19-65), then runs
the full setup_cooke2 recipe against them end-to-end.
"""

import os
import sys

import h5py
import numpy as np
import pytest

from shakti_tpu.data import netcdf as ncio
from shakti_tpu.data.lakes import load_inventory, load_inventory_hdf5

LX = LY = 100e3


def _write_grid_h5(path, var, xvar, yvar, x, y, f):
    with h5py.File(path, "w") as h5:
        h5.create_dataset(xvar, data=np.asarray(x, np.float64))
        h5.create_dataset(yvar, data=np.asarray(y, np.float64))
        h5.create_dataset(var, data=np.asarray(f, np.float64))


@pytest.fixture
def data_dir(tmp_path):
    """BedMachine/ATL14/AQ1-convention fixture files over the Cook_E2-like
    synthetic domain, plus a S&F-style lake-outline HDF5 and a gmsh mesh."""
    gx = np.linspace(-0.2 * LX, 1.2 * LX, 60)
    gy = np.linspace(-0.2 * LY, 1.2 * LY, 55)
    X, Y = np.meshgrid(gx, gy)
    r2 = ((X - 0.55 * LX) ** 2 + (Y - 0.5 * LY) ** 2) / (12e3) ** 2
    bed = -400.0 + 0.004 * X + 0.002 * Y - 120.0 * np.exp(-r2)
    surf = bed + 1500.0 - 0.006 * X
    ghf_mw = 55.0 + 10.0 * np.sin(X / 3e4) * np.cos(Y / 4e4)   # mW/m^2

    # BedMachine: y stored DESCENDING (reference flipuds by hand,
    # setup_cooke2.py:40-42)
    bm = tmp_path / "bedmachine.nc"
    _write_grid_h5(bm, "bed", "x", "y", gx, gy[::-1], np.flipud(bed))
    # ATL14: ascending axes, variable 'h'
    atl = tmp_path / "atl14.nc"
    _write_grid_h5(atl, "h", "x", "y", gx, gy, surf)
    # AQ1: axes 'X'/'Y', 'Q' in mW/m^2
    aq1 = tmp_path / "aq1.nc"
    _write_grid_h5(aq1, "Q", "X", "Y", gx, gy, ghf_mw)

    # Siegfried & Fricker-style outlines: per-lake group, (1, k) x/y in
    # METERS (load_lakes.py divides by 1e3), 'citation' attr
    th = np.linspace(0, 2 * np.pi, 37)
    ox = 0.55 * LX + 11e3 * np.cos(th)
    oy = 0.5 * LY + 9e3 * np.sin(th)
    lakes = tmp_path / "outlines.h5"
    with h5py.File(lakes, "w") as h5:
        for name, scale in (("Cook_E2", 1.0), ("Other_Lake", 0.3)):
            g = h5.create_group(name)
            g.create_dataset("x", data=(ox * scale)[None, :])
            g.create_dataset("y", data=(oy * scale)[None, :])
            g.attrs["citation"] = np.array([b"Siegfried & Fricker (2018)"])

    # production-style .msh for the mesh-dir route
    from shakti_tpu.mesh.generate import rectangle_mesh
    from shakti_tpu.mesh.msh_io import write_msh
    nodes, cells = rectangle_mesh(16, 16, LX, LY, jitter=0.2, seed=3)
    mesh_dir = tmp_path / "meshes"
    mesh_dir.mkdir()
    write_msh(str(mesh_dir / "Cook_E2_mesh.msh"), nodes, cells)

    return {"bm": str(bm), "atl": str(atl), "aq1": str(aq1),
            "lakes": str(lakes), "mesh_dir": str(mesh_dir),
            "grids": (gx, gy, bed, surf, ghf_mw)}


def test_read_bedmachine_flips_descending_y(data_dir):
    gx, gy, bed, surf, ghf = data_dir["grids"]
    x, y, f = ncio.read_bedmachine(data_dir["bm"])
    assert np.all(np.diff(y) > 0)
    np.testing.assert_allclose(x, gx)
    np.testing.assert_allclose(y, gy)
    np.testing.assert_allclose(f, bed)     # flipped back to ascending rows


def test_read_atl14(data_dir):
    gx, gy, bed, surf, ghf = data_dir["grids"]
    x, y, f = ncio.read_atl14(data_dir["atl"])
    np.testing.assert_allclose(f, surf)


def test_read_aq1_rescales_mw(data_dir):
    gx, gy, bed, surf, ghf_mw = data_dir["grids"]
    x, y, q = ncio.read_aq1(data_dir["aq1"])
    np.testing.assert_allclose(q, ghf_mw * 1e-3)
    assert 0.04 < np.median(q) < 0.08      # plausible W/m^2


def test_load_inventory_hdf5(data_dir):
    inv = load_inventory_hdf5(data_dir["lakes"])
    assert set(inv) == {"Cook_E2", "Other_Lake"}
    rec = inv["Cook_E2"]
    assert rec["outline"].shape == (37, 2)
    # km units: the synthetic outline spans ~22 km in x
    span = rec["outline"][:, 0].max() - rec["outline"][:, 0].min()
    assert span == pytest.approx(22.0, rel=1e-6)
    assert rec["area_km2"] == pytest.approx(np.pi * 11.0 * 9.0, rel=0.02)
    assert "Siegfried" in rec["cite"]
    # extension dispatch
    assert set(load_inventory(data_dir["lakes"])) == set(inv)


def test_setup_cooke2_consumes_real_data_end_to_end(data_dir, monkeypatch):
    """The full reference recipe (setup_cooke2.py:34-99) against the fixture
    datasets: mesh dir + inventory + three netCDF grids + a short run."""
    monkeypatch.setenv("SHAKTI_MESH_DIR", data_dir["mesh_dir"])
    monkeypatch.setenv("SHAKTI_LAKE_INVENTORY", data_dir["lakes"])
    monkeypatch.setenv("SHAKTI_BEDMACHINE", data_dir["bm"])
    monkeypatch.setenv("SHAKTI_ATL14", data_dir["atl"])
    monkeypatch.setenv("SHAKTI_AQ1", data_dir["aq1"])
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import setups.setup_cooke2 as sc

    md = sc.initialize(days=0.25, nt_per_day=24, results_name=None)
    gx, gy, bed, surf, ghf_mw = data_dir["grids"]

    # nodal fields really came from the files (not the synthetic fallback)
    from shakti_tpu.data.interp import GridInterpolator
    np.testing.assert_allclose(md.z_b, GridInterpolator(gx, gy, bed)(md.x, md.y),
                               rtol=1e-12)
    np.testing.assert_allclose(md.G,
                               GridInterpolator(gx, gy, ghf_mw * 1e-3)(md.x, md.y),
                               rtol=1e-12)
    # lake mask from the inventory outline (22 x 18 km ellipse)
    assert 0.01 < md.lake_bdry.mean() < 0.2
    assert md.lake_bdry[np.argmin((md.x - 0.55 * LX) ** 2
                                  + (md.y - 0.5 * LY) ** 2)] == 1.0

    from shakti_tpu.api.run import solve
    out = solve(md, progress=False)
    assert np.isfinite(np.asarray(out["state"].N)).all()
    assert out["steps"] == 6


# ---------------------------------------------------------------- contracts

def test_read_grid_transposed_field_autocorrects(tmp_path):
    """(x, y)-ordered storage is unambiguous when nx != ny: fixed silently."""
    x = np.linspace(0, 10, 7)
    y = np.linspace(0, 5, 5)
    f = np.outer(x, y)                      # (nx, ny): transposed
    p = tmp_path / "t.nc"
    _write_grid_h5(p, "bed", "x", "y", x, y, f)
    gx, gy, gf = ncio.read_grid(str(p), "bed")
    assert gf.shape == (y.size, x.size)
    np.testing.assert_allclose(gf, f.T)


def test_read_grid_shape_mismatch_raises(tmp_path):
    x = np.linspace(0, 10, 7)
    y = np.linspace(0, 5, 5)
    p = tmp_path / "bad.nc"
    _write_grid_h5(p, "bed", "x", "y", x, y, np.zeros((9, 9)))
    with pytest.raises(ValueError, match="does not match axes"):
        ncio.read_grid(str(p), "bed")


def test_read_grid_3d_field_raises(tmp_path):
    x = np.linspace(0, 10, 7)
    y = np.linspace(0, 5, 5)
    p = tmp_path / "b3.nc"
    _write_grid_h5(p, "bed", "x", "y", x, y, np.zeros((2, 5, 7)))
    with pytest.raises(ValueError, match="2-D grid"):
        ncio.read_grid(str(p), "bed")


def test_read_bedmachine_wrong_units_raises(tmp_path):
    """A field whose magnitude cannot be a bed elevation (e.g. reading a
    packed/int mask by mistake) fails loudly with the product name."""
    x = np.linspace(0, 10e3, 8)
    y = np.linspace(0, 10e3, 6)
    p = tmp_path / "bm.nc"
    _write_grid_h5(p, "bed", "x", "y", x, y, np.full((6, 8), 123456.0))
    with pytest.raises(ValueError, match="BedMachine.*plausible range"):
        ncio.read_bedmachine(str(p))


def test_read_aq1_implausible_units_raises(tmp_path):
    x = np.linspace(0, 10e3, 8)
    y = np.linspace(0, 10e3, 6)
    p = tmp_path / "aq.nc"
    _write_grid_h5(p, "Q", "X", "Y", x, y, np.full((6, 8), 5e4))
    with pytest.raises(ValueError, match="AQ1.*neither"):
        ncio.read_aq1(str(p))


def test_read_grid_nonmonotonic_axis_raises(tmp_path):
    x = np.array([0.0, 2.0, 1.0, 3.0])
    y = np.linspace(0, 5, 5)
    p = tmp_path / "nm.nc"
    _write_grid_h5(p, "bed", "x", "y", x, y, np.zeros((5, 4)))
    with pytest.raises(ValueError, match="monotonic"):
        ncio.read_grid(str(p), "bed")

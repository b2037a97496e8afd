"""Thin netCDF grid-reading adapters (optional dependency: netCDF4).

The reference reads three Antarctic datasets directly in its setup module
(reference setups/setup_cooke2.py:39-62: BedMachine bed, ICESat-2 ATL14
surface, AQ1 geothermal flux).  These helpers reproduce those access
patterns as small functions returning plain (x, y, field) numpy arrays with
ascending-y orientation, keeping the heavy dependency optional and out of
the core framework (SURVEY §2b last row: data adapters live at the edge).
"""

from __future__ import annotations

import numpy as np


def read_grid(path: str, var: str, xvar: str = "x", yvar: str = "y",
              flip_y: str = "auto"):
    """Read (x, y, f) from a netCDF file; ensures ascending x and y.

    Prefers the netCDF4 library; falls back to h5py (netCDF-4 files ARE
    HDF5 files, so BedMachine/ATL14/AQ1-format data stay readable in
    environments without netCDF4 — only netCDF-3 classic files need the
    real library).

    ``flip_y='auto'`` flips rows when the y axis is descending (BedMachine's
    convention — reference setup_cooke2.py:40-42 does np.flipud by hand).
    """
    x, y, f = _read_vars(path, var, xvar, yvar)
    if x.size >= 2 and x[1] < x[0]:
        x, f = x[::-1], f[:, ::-1]
    if flip_y == "auto" and y.size >= 2 and y[1] < y[0]:
        y, f = y[::-1], np.flipud(f)
    return x, y, f


def _read_vars(path: str, var: str, xvar: str, yvar: str):
    try:
        from netCDF4 import Dataset  # optional dependency
    except ImportError:
        return _read_vars_h5(path, var, xvar, yvar)
    ds = Dataset(path)
    try:
        raw = ds[var][:]
        # masked cells -> NaN (matching the h5py fallback's semantics).
        # Convert to float BEFORE filling: filling NaN into a masked
        # integer-typed variable (e.g. BedMachine's int8 'mask') raises.
        f = (raw.astype(np.float64).filled(np.nan)
             if hasattr(raw, "filled")
             else np.asarray(raw, dtype=np.float64))
        x = np.asarray(ds[xvar][:]).astype(np.float64)
        y = np.asarray(ds[yvar][:]).astype(np.float64)
    finally:
        ds.close()
    return x, y, f


def _read_vars_h5(path: str, var: str, xvar: str, yvar: str):
    """netCDF-4 (= HDF5) fallback reader.

    Applies CF packing the way netCDF4's auto-maskandscale would:
    raw * scale_factor + add_offset, with _FillValue/missing_value cells
    set to NaN BEFORE unpacking (Antarctic gridded products commonly store
    packed int16 — returning raw packed integers would silently build a
    garbage model)."""
    import h5py  # optional dependency

    def unpack(ds):
        raw = np.asarray(ds[()], dtype=np.float64)
        fill = ds.attrs.get("_FillValue", ds.attrs.get("missing_value"))
        if fill is not None:
            raw = np.where(raw == np.float64(np.ravel(fill)[0]), np.nan, raw)
        scale = ds.attrs.get("scale_factor")
        offset = ds.attrs.get("add_offset")
        if scale is not None:
            raw = raw * np.float64(np.ravel(scale)[0])
        if offset is not None:
            raw = raw + np.float64(np.ravel(offset)[0])
        return raw

    with h5py.File(path, "r") as h5:
        f = unpack(h5[var])
        x = unpack(h5[xvar]).reshape(-1)
        y = unpack(h5[yvar]).reshape(-1)
    return x, y, f


def read_bedmachine(path: str):
    """BedMachine Antarctica bed elevation (reference setup_cooke2.py:39-44)."""
    return read_grid(path, "bed")


def read_atl14(path: str):
    """ICESat-2 ATL14 surface height (reference setup_cooke2.py:48-53)."""
    return read_grid(path, "h")


def read_aq1(path: str):
    """AQ1 geothermal heat flux (reference setup_cooke2.py:57-62):
    'Q' on axes 'X'/'Y'.

    The framework's G field is W/m^2 (typical Antarctic values 0.04-0.12);
    AQ1 distributions commonly store mW/m^2 (values ~40-120).  The
    reference loads Q without conversion, which is only consistent if its
    file stores W/m^2 — to be robust to either convention we detect the
    unit from the magnitude and rescale mW/m^2 -> W/m^2."""
    x, y, q = read_grid(path, "Q", xvar="X", yvar="Y")
    finite = q[np.isfinite(q)]
    if finite.size and np.median(np.abs(finite)) > 1.0:   # mW/m^2
        q = q * 1e-3
    return x, y, q

"""Post-processing: results loading, dof permutation, physical reductions,
and plot/movie rendering.

Library-form replacement for the reference's notebook-only layer
(reference notebooks/solution-plots.ipynb + source/dof_helpers.py):

  * :func:`load_results` reads a results directory (the same .npy protocol
    the reference writes);
  * :func:`dofs_to_serial` is the coordinate-matching permutation of
    reference dof_helpers.py:5-13 (needed there because parallel runs gather
    dofs in rank order; our runs already save in user node order, but the
    utility is kept for cross-checking against reference outputs);
  * reductions reproduce solution-plots.ipynb cells 7/10/12/13: lake-mean
    effective pressure, lake level, filling-rate regression, mean gap
    height, off-lake peak flux, far-field validation ratio;
  * :func:`render_frames` draws the 6-panel maps (matplotlib optional).
"""

from __future__ import annotations

import os

import numpy as np

from shakti_tpu.params import DEFAULT_PARAMS, PhysicalParams


def load_results(results_dir: str) -> dict:
    out = {}
    for k in ("t", "nodes_x", "nodes_y", "N", "b", "qx", "qy"):
        path = os.path.join(results_dir, f"{k}.npy")
        if os.path.exists(path):
            out[k] = np.load(path)
    return out


def dofs_to_serial(nodes_parallel: np.ndarray, nodes_serial: np.ndarray,
                   tol: float = 1e-2) -> np.ndarray:
    """Permutation mapping a parallel-ordered nodal vector onto the serial
    mesh ordering by coordinate matching (reference dof_helpers.py:5-13,
    vectorized: the reference's per-mismatch python loop is O(n^2) in the
    worst case; this sorts once)."""
    def keys(nodes):
        return np.round(nodes / tol).astype(np.int64)

    kp, ks = keys(nodes_parallel), keys(nodes_serial)
    # lexicographic sort of both; match rows
    def lexorder(k):
        return np.lexsort((k[:, 1], k[:, 0]))

    op, os_ = lexorder(kp), lexorder(ks)
    if not np.array_equal(kp[op], ks[os_]):
        raise ValueError("node sets do not match within tolerance")
    map_dofs = np.empty(nodes_parallel.shape[0], dtype=np.int64)
    map_dofs[os_] = op
    return map_dofs


# ---------------------------------------------------------------- reductions

def lake_mean(field_hist: np.ndarray, lake_mask: np.ndarray) -> np.ndarray:
    """Time series of the lake-average of a nodal history (n_t, n)."""
    m = np.asarray(lake_mask, dtype=bool)
    return field_hist[:, m].mean(axis=1)


def lake_level(N_hist: np.ndarray, lake_mask: np.ndarray,
               params: PhysicalParams = DEFAULT_PARAMS) -> np.ndarray:
    """Lake water-level change [m]: -(mean N - mean N at t0)/(rho_w g)
    (reference solution-plots.ipynb cell 12)."""
    Nbar = lake_mean(N_hist, lake_mask)
    return -(Nbar - Nbar[0]) / (params.rho_w * params.g)


def filling_rate(t: np.ndarray, N_hist: np.ndarray, lake_mask: np.ndarray,
                 params: PhysicalParams = DEFAULT_PARAMS) -> float:
    """Linear-regression lake-level rate [m/s] (cell 12's linregress)."""
    lvl = lake_level(N_hist, lake_mask, params)
    A = np.vstack([t, np.ones_like(t)]).T
    slope, _ = np.linalg.lstsq(A, lvl, rcond=None)[0]
    return float(slope)


def mean_gap(b_hist: np.ndarray, mask: np.ndarray | None = None) -> np.ndarray:
    m = slice(None) if mask is None else np.asarray(mask, dtype=bool)
    return b_hist[:, m].mean(axis=1)


def max_flux(qx_hist: np.ndarray, qy_hist: np.ndarray,
             exclude_mask: np.ndarray | None = None) -> np.ndarray:
    """Max |q| per save, optionally excluding e.g. lake nodes
    (cell 12's off-lake peak discharge)."""
    qmag = np.hypot(qx_hist, qy_hist)
    if exclude_mask is not None:
        qmag = qmag[:, ~np.asarray(exclude_mask, dtype=bool)]
    return qmag.max(axis=1)


def far_field_ratio(N_hist: np.ndarray, far_mask: np.ndarray,
                    N_bdry: float) -> float:
    """Validation: steady far-field mean N / boundary value — the
    reference's quantitative sanity check (solution-plots.ipynb cell 13:
    0.36 MPa vs 0.37 MPa)."""
    return float(N_hist[-1, np.asarray(far_mask, dtype=bool)].mean() / N_bdry)


# ------------------------------------------------------------------- plotting

def render_frames(results: dict, out_dir: str, lake_outline=None,
                  every: int = 1, params: PhysicalParams = DEFAULT_PARAMS):
    """Render per-save map frames (N, b, |q|) as PNGs — the library
    equivalent of solution-plots.ipynb cell 12's movie frames.
    Requires matplotlib."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import matplotlib.tri as mtri

    os.makedirs(out_dir, exist_ok=True)
    x, y, t = results["nodes_x"], results["nodes_y"], results["t"]
    tri = mtri.Triangulation(x / 1e3, y / 1e3)
    for j in range(0, t.size, every):
        fig, axs = plt.subplots(1, 3, figsize=(15, 4.2))
        for ax, (field, label, scale) in zip(axs, [
            (results["N"][j], "N [MPa]", 1e-6),
            (results["b"][j], "b [mm]", 1e3),
            (np.hypot(results["qx"][j], results["qy"][j]), "|q| [m$^2$/s]", 1.0),
        ]):
            tc = ax.tricontourf(tri, field * scale, levels=21)
            fig.colorbar(tc, ax=ax, label=label)
            if lake_outline is not None:
                ax.plot(lake_outline[:, 0] / 1e3, lake_outline[:, 1] / 1e3,
                        "w--", lw=1)
            ax.set_xlabel("x [km]")
        axs[0].set_ylabel("y [km]")
        fig.suptitle(f"t = {t[j] / 3.154e7 * 365:.1f} days")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"frame_{j:05d}.png"), dpi=110)
        plt.close(fig)

"""Valley oracle stationarity leg (suite OV, r5 session 2).

The FV valley march from the SHMIP cold start (b0 = 1 cm) falls into the
capped-gap branch (dissipation melt self-sustains the 0.5 m cap:
frac_cap 0.83, rate_b ~ 190/yr after 3 yr at 48x12 — /tmp/shmip_vx.log),
while the framework's transient from the SAME init converges to the
mm-scale sheet.  Cold-start agreement is therefore the wrong test — the
capped system has more than one reachable branch and the two
discretizations take different paths through the violent cold start.

The decisive check is STATIONARITY: interpolate the framework's
converged E1 state onto the FV grid and march the FV dynamics from it.
If the framework state is (near-)stationary under the independent
discretization, the suite-E table rests on two implementations; if the
FV march leaves it (gap runaway from an mm-scale start), the codes
genuinely disagree about the valley sheet branch and the suite stays
single-implementation (reported honestly either way).

Writes scripts/valley_stationarity.json; run on CPU (pins cpu).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import setups.setup_shmip as shmip          # noqa: E402
import oracle.shmip_fv2d as fv2d            # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "valley_stationarity.json")
FEM_CACHE = "/tmp/valley_e1_fem.npz"


def fem_e1_state():
    """Framework E1 fields (nodes, N, b), memoized to /tmp."""
    if os.path.exists(FEM_CACHE):
        d = np.load(FEM_CACHE)
        return d["xy"], d["N"], d["b"]
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__))))
    from shmip_validate import run_e_case
    md, state, steady_rel, conv, Q_out, Q_src = run_e_case("E1", years=1.0)
    xy = np.stack([md.x, md.y], axis=1)
    N = np.asarray(state.N, float)
    b = np.asarray(state.b, float)
    np.savez(FEM_CACHE, xy=xy, N=N, b=b,
             steady_rel=steady_rel, conv=conv)
    return xy, N, b


def main(nx=48, ny=12, years=0.5):
    from scipy.interpolate import griddata

    t0 = time.time()
    xy, N_fem, b_fem = fem_e1_state()
    print(f"# FEM E1 state ready ({time.time() - t0:.0f}s) "
          f"b mean {b_fem.mean() * 1e3:.2f} mm", flush=True)

    g = fv2d.valley_grid(shmip.CASES_E["E1"], nx, ny)
    cap = np.maximum(np.minimum(g.thick, 0.5), 1e-3)
    X, Y = np.meshgrid(g.x, g.y)
    pts = np.stack([X.ravel(), Y.ravel()], axis=1)

    def interp(f):
        v = griddata(xy, f, pts, method="linear")
        vn = griddata(xy, f, pts, method="nearest")
        v = np.where(np.isfinite(v), v, vn)
        return v.reshape(ny, nx)

    N0 = np.where(g.mask, interp(N_fem), 0.0)
    b0 = np.where(g.mask, np.clip(interp(b_fem), fv2d.B_FLOOR, cap), 1e-4)
    act = g.mask
    trough = act & (g.x >= 2e3)[None, :] & (g.x <= 4e3)[None, :]
    interior = act & (g.thick >= 50.0)

    T_YR = 3.1536e7
    samp = T_YR * years * (np.arange(1, 19) / 18.0)
    t0 = time.time()
    m = fv2d.march("E1(stationarity)", years=years, dt0=900.0,
                   dt_max=6 * 3600.0, noise=0.0, seed=0,
                   b_init=b0, N_init=N0, max_rel=0.1,
                   input_rate=lambda t: shmip.E_INPUT, grid=g, b_cap=cap,
                   sample_times=samp, sample_mask=trough,
                   rel_pctile=98.0, verbose=200)
    N1, b1 = m["N2d"], m["b2d"]
    relN = (np.linalg.norm(N1[interior] - N0[interior])
            / np.linalg.norm(N0[interior]))
    relb = (np.linalg.norm(b1[interior] - b0[interior])
            / np.linalg.norm(b0[interior]))
    res = {
        "grid_nx_ny": [nx, ny], "years_marched": m["t_years"],
        "steps": m["steps"], "wall_s": round(time.time() - t0, 1),
        "fem_b_trough_mm": float(b0[trough].mean() * 1e3),
        "fv_b_trough_mm_end": float(b1[trough].mean() * 1e3),
        "fem_N_trough_MPa": float(N0[trough].mean() / 1e6),
        "fv_N_trough_MPa_end": float(N1[trough].mean() / 1e6),
        "relN_interior": float(relN), "relb_interior": float(relb),
        "frac_cap_start": float((b0[act] >= cap[act] - 1e-12).mean()),
        "frac_cap_end": float((b1[act] >= cap[act] - 1e-12).mean()),
        "rate_b_yr_end": m["rate_b_yr"],
        "trough_N_samples_MPa": (np.asarray(m["samples"]) / 1e6).tolist(),
    }
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    main(*(int(a) for a in args[:2]))

"""SHMIP suite-A validation artifact (VERDICT r1 item 8).

Runs A1/A3/A5 to long horizon on CPU float64 and compares against the
INDEPENDENT 1D steady oracle (oracle/shmip_oracle.py — scipy shooting on
the y-uniform steady SHAKTI equations, sharing no code with the framework),
plus exact global mass-conservation checks (solve/diagnostics.py).

Writes SHMIP.md + scripts/shmip_results.json.

    python scripts/shmip_validate.py [--quick]
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

from oracle.shmip_oracle import steady_profile

import setups.setup_shmip as shmip
from shakti_tpu.solve import diagnostics as diag
from shakti_tpu.solve.timestep import (make_step_fn, run_window,
                                       timestep_sizes)

WINDOW = (30e3, 90e3)


def run_case(case, years, nx=60, ny=12, nt_per_day=4):
    md = shmip.initialize(case, nx=nx, ny=ny, days=365 * years,
                          nt_per_day=nt_per_day)
    mesh, static, state, cfg = md.freeze()
    step = make_step_fn(mesh, static, md.params, cfg)
    dts = timestep_sizes(md.timesteps, dtype=md.dtype)
    runner = jax.jit(lambda s, d: run_window(step, s, d))
    p = steady_profile(case)
    x = md.x
    No = np.interp(x, p["x"], p["N"])
    bo = np.interp(x, p["x"], p["b"])
    win = (x > WINDOW[0]) & (x < WINDOW[1])
    yearly = []
    W = 365 * nt_per_day
    i = 0
    while i + W <= dts.shape[0]:
        state, dstep = runner(state, dts[i:i + W])
        i += W
        N2, b2 = np.asarray(state.N), np.asarray(state.b)
        band = np.abs(x - 50e3) < 2e3
        yearly.append({
            "year": i // W,
            "relN_win": float(np.linalg.norm(N2[win] - No[win])
                              / np.linalg.norm(No[win])),
            "relb_win": float(np.linalg.norm(b2[win] - bo[win])
                              / np.linalg.norm(bo[win])),
            "yspread_50km": float((N2[band].max() - N2[band].min())
                                  / N2[band].mean()),
            "converged": bool(np.asarray(dstep["converged"]).all()),
        })
    Q_out = diag.boundary_discharge(mesh, static, state, md.params)
    Q_src = diag.water_production(mesh, static, state, md.params)
    return md, state, p, yearly, Q_out, Q_src


def main(quick=False):
    plans = [("A1", 3 if quick else 10), ("A3", 2 if quick else 10),
             ("A5", 2 if quick else 12)]
    out = {}
    lines = [
        "# SHMIP suite-A validation",
        "",
        "Framework (2D transient, CPU f64, 60x12 rectangle) vs the",
        "independent 1D steady oracle (`oracle/shmip_oracle.py`, scipy",
        "shooting) over the interior window x in [30, 90] km, plus exact",
        "global mass conservation (`solve/diagnostics.py`).",
        "",
        "| case | input [m/s] | years | relN (window) | relb (window) | "
        "y-spread @50km | Q_out [m^3/s] | Q_src [m^3/s] | imbalance |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for case, years in plans:
        t0 = time.time()
        md, state, p, yearly, Q_out, Q_src = run_case(case, years)
        last = yearly[-1]
        imb = abs(Q_out - Q_src) / max(abs(Q_src), 1e-30)
        out[case] = {"years": years, "yearly": yearly,
                     "Q_out": Q_out, "Q_src": Q_src,
                     "Q_oracle": float(-p["q_margin"] * 20e3),
                     "imbalance": imb,
                     "wall_s": round(time.time() - t0, 1)}
        lines.append(
            f"| {case} | {shmip.CASES_A[case]:.3g} | {years} "
            f"| {last['relN_win']:.2e} | {last['relb_win']:.2e} "
            f"| {last['yspread_50km']:.3f} "
            f"| {Q_out:.3f} | {Q_src:.3f} | {imb:.1e} |")
        print(f"{case}: {json.dumps(out[case]['yearly'][-1])}", flush=True)
    lines += [
        "",
        "## Reading",
        "",
        "- **A1** (low input, laminar sheet): the 2D transient converges to",
        "  the y-uniform steady branch and matches the independent oracle to",
        "  a few 1e-4 relative in N — the quantitative SHMIP anchor.",
        "- **A3/A5** (high input): the y-uniform branch is UNSTABLE — the",
        "  sheet self-organizes laterally (y-spread grows over years; the",
        "  channelization behavior SHAKTI is designed to capture, Sommers",
        "  et al. 2018 §4).  Early-time (year 1) profiles still track the",
        "  1D oracle to a few %; at long horizon only y-averaged structure",
        "  and the conservation identities are comparable.",
        "- **Conservation**: boundary discharge (reaction-force identity)",
        "  vs independently quadratured interior production, at the final",
        "  state.  For the steady A1 these also match the oracle's margin",
        f"  discharge (A1 oracle: {out['A1']['Q_oracle']:.3f} m^3/s).",
        "",
        "Published SHMIP tuning note: de Fleurian et al. (2018) report",
        "per-model mean-N profiles that differ across the 13 participating",
        "models by factors of several; without the distribution files the",
        "oracle above (same physics, independent discretization) is the",
        "sharper check.  This artifact is regenerated by",
        "`python scripts/shmip_validate.py`.",
    ]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "SHMIP.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(root, "scripts", "shmip_results.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote SHMIP.md + scripts/shmip_results.json")


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)

"""SHMIP validation artifact: suites A-F + S (VERDICT r1 item 8 + r2 item 5).

Suite A (A1/A3/A5, distributed input): long-horizon CPU f64 transients vs
the INDEPENDENT 1D steady oracle (oracle/shmip_oracle.py — scipy shooting
on the y-uniform steady SHAKTI equations, sharing no code with the
framework), plus exact global mass-conservation checks
(solve/diagnostics.py).

Suite B (B1-B5, moulin input): equal-rate moulins totaling the
A5-equivalent 90 m^3/s; checks global conservation per case and the
many-moulins -> distributed-limit convergence of the y-mean N profile
(B5 vs A5).

Suite C (C1-C4, diurnal forcing on B5): window-mean-N oscillation
amplitude must grow monotonically with the forcing amplitude Ra and
oscillate about the B5 steady value.

Suite D (D1-D5, seasonal degree-day forcing): melt-season amplitude of
the window-mean N must grow monotonically with the temperature offset dT,
and the winter state must return to the A1 (background-only) branch.

Suite E (E1-E5, valley glacier, bed overdeepening ladder): steady
conservation on the para-independent footprint; mean N reported overall
and in the overdeepened trough band.

Suite F (F1-F5, seasonal forcing on the E1 valley): amplitude of the
glacier-mean N monotone in dT.

Suite S (steady cross-check): all six suite-A cases solved DIRECTLY with
the pseudo-transient-continuation steady solver (md.solve_steady) and
judged against the same 1D oracle — for A1/A3/A5, transient marching and
PTC must land on the same state; A2/A4/A6 (no transient twin) complete
6/6 suite-A case coverage via the steady route.

Suite O (oracle triangle): a THIRD independent implementation
(oracle/shmip_fv2d.py — cell-centered FV, scipy.sparse direct LU) closes
the self-oracle loop: its column Newton anchors the 1D shooting oracle,
and its 2D channelizing march independently bounds the framework's
suite-A window deviations (VERDICT r3 weak #2).

Results are cached per-suite in scripts/shmip_results.json; SHMIP.md is
regenerated from the cache, so suites can be (re)run selectively:

    python scripts/shmip_validate.py [--quick] [--suites ABCDEFSO]
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
from shakti_tpu.solve.timestep import (make_forcing, make_step_fn,
                                       run_window, timestep_sizes)

WINDOW = (30e3, 90e3)
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(ROOT, "scripts", "shmip_results.json")


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


def ymean_profile(md, N):
    """y-averaged N per structured-mesh x-column."""
    xs = np.unique(np.round(md.x, 6))
    prof = np.array([N[np.isclose(md.x, xv)].mean() for xv in xs])
    return xs, prof


def run_b_case(case, years, nx=60, ny=12, nt_per_day=4):
    """Suite B: moulin input (A1 background + equal-rate moulins totaling
    the A5-equivalent 90 m^3/s).  Returns steady metrics + the y-mean
    profile for the many-moulins -> distributed-limit comparison."""
    md = shmip.initialize(case, nx=nx, ny=ny, days=365 * years,
                          nt_per_day=nt_per_day)
    mesh, static, state, cfg = md.freeze()
    step = make_step_fn(mesh, static, md.params, cfg)
    dts = timestep_sizes(md.timesteps, dtype=md.dtype)
    runner = jax.jit(lambda s, d: run_window(step, s, d))
    conv = True
    W = 365 * nt_per_day
    i = 0
    while i < dts.shape[0]:
        state, dstep = runner(state, dts[i:i + W])
        conv = conv and bool(np.asarray(dstep["converged"]).all())
        i += W
    Q_out = diag.boundary_discharge(mesh, static, state, md.params)
    Q_src = diag.water_production(mesh, static, state, md.params)
    return md, state, Q_out, Q_src, conv


def run_c_case(case, state_b5, days=10, nt_per_day=48):
    """Suite C: diurnal forcing on the spun-up B5 state.  Measures the
    window-mean-N oscillation over the final two diurnal cycles."""
    import dataclasses as _dc

    import jax.numpy as jnp

    md = shmip.initialize(case, nx=60, ny=12, days=days,
                          nt_per_day=nt_per_day)
    mesh, static, state0, cfg = md.freeze()
    # continue from the B5 steady state (same mesh/ordering by construction)
    cvt = lambda a: jnp.asarray(np.asarray(a), dtype=md.dtype)
    state = _dc.replace(state0, N=cvt(state_b5.N), b=cvt(state_b5.b),
                        q=cvt(state_b5.q), melt=cvt(state_b5.melt),
                        N_prev=cvt(state_b5.N))
    forcing = make_forcing(md.timesteps, dtype=md.dtype,
                           seasonal=md.seasonal_inputs)
    step = make_step_fn(mesh, static, md.params, cfg)
    runner = jax.jit(lambda s, f: run_window(step, s, f))
    win = (md.x > WINDOW[0]) & (md.x < WINDOW[1])

    nt = md.timesteps.size
    i0 = nt - 2 * nt_per_day          # settle, then sample the final 2 days
    take = lambda a, i, j: a[i:j]
    f_pre = jax.tree_util.tree_map(lambda a: take(a, 0, i0), forcing)
    conv = True
    state, dstep = runner(state, f_pre)
    conv = conv and bool(np.asarray(dstep["converged"]).all())
    sub = []
    for k in range(i0, nt):
        f_k = jax.tree_util.tree_map(lambda a: take(a, k, k + 1), forcing)
        state, dstep = runner(state, f_k)
        conv = conv and bool(np.asarray(dstep["converged"]).all())
        sub.append(float(np.asarray(state.N)[win].mean()))
    sub = np.array(sub)
    # absolute amplitude: the cycle-mean N under strong diurnal forcing
    # sits near zero (the forcing rectifies the nonlinear system toward
    # low N), so a mean-relative amplitude is ill-conditioned
    return md, {
        "Ra": shmip.CASES_C[case],
        "N_mean_cycle": float(sub.mean()),
        "N_amp_MPa": float((sub.max() - sub.min()) / 1e6),
        "converged": conv,
    }


def run_seasonal_case(case, spin_years, nt_per_day=4, sample_days=10,
                      **init_kw):
    """Suites D/F: degree-day seasonal forcing.  Spin ``spin_years`` then
    sample the final year's window-mean N at ``sample_days`` cadence.
    Returns (md, state, samples, conv, Q_out, Q_src)."""
    years = spin_years + 1
    md = shmip.initialize(case, days=365 * years, nt_per_day=nt_per_day,
                          **init_kw)
    mesh, static, state, cfg = md.freeze()
    step = make_step_fn(mesh, static, md.params, cfg)
    forcing = make_forcing(md.timesteps, dtype=md.dtype,
                           degree_day=md.degree_day)
    runner = jax.jit(lambda s, f: run_window(step, s, f))
    take = lambda i, j: jax.tree_util.tree_map(lambda a: a[i:j], forcing)
    nt = md.timesteps.size
    W = 365 * nt_per_day
    i0 = spin_years * W
    conv = True
    if case.startswith("F"):
        win = np.ones(md.x.size, dtype=bool)      # glacier mean
    else:
        win = (md.x > WINDOW[0]) & (md.x < WINDOW[1])
    state, dstep = runner(state, take(0, i0))
    conv = conv and bool(np.asarray(dstep["converged"]).all())
    samples = []
    Wd = sample_days * nt_per_day
    for k in range(i0, nt, Wd):
        state, dstep = runner(state, take(k, min(k + Wd, nt)))
        conv = conv and bool(np.asarray(dstep["converged"]).all())
        samples.append(float(np.asarray(state.N)[win].mean()))
    Q_out = diag.boundary_discharge(mesh, static, state, md.params)
    Q_src = diag.water_production(mesh, static, state, md.params)
    return md, state, np.array(samples), conv, Q_out, Q_src


def run_e_case(case, years=1.0, nt_per_day=24, resolution=75.0):
    """Suite E: valley glacier, steady input; run to (near) steady state
    with hourly steps (the violent cold start needs them), checking
    steadiness by the relative change over the final 30 days."""
    md = shmip.initialize(case, days=365 * years, nt_per_day=nt_per_day,
                          resolution=resolution)
    mesh, static, state, cfg = md.freeze()
    step = make_step_fn(mesh, static, md.params, cfg)
    dts = timestep_sizes(md.timesteps, dtype=md.dtype)
    runner = jax.jit(lambda s, d: run_window(step, s, d))
    nt = dts.shape[0]
    i0 = nt - 30 * nt_per_day
    conv = True
    state, dstep = runner(state, dts[:i0])
    conv = conv and bool(np.asarray(dstep["converged"]).all())
    N_before = np.asarray(state.N).copy()
    state, dstep = runner(state, dts[i0:])
    conv = conv and bool(np.asarray(dstep["converged"]).all())
    N_after = np.asarray(state.N)
    steady_rel = float(np.linalg.norm(N_after - N_before)
                       / np.linalg.norm(N_after))
    # valley budget needs the certified (frozen-field re-solved) identity:
    # the thickness-capped terminus rows turn per-step gap flicker into
    # O(100 m^3/s) of reaction junk otherwise (see diag.certified_budget)
    Q_out, Q_src, info = diag.certified_budget(mesh, static, state,
                                               md.params, cfg)
    conv = conv and info["converged"]
    return md, state, steady_rel, conv, Q_out, Q_src


# ---------------------------------------------------------------- suites

def suite_A(out, quick):
    plans = [("A1", 3 if quick else 10), ("A3", 2 if quick else 10),
             ("A5", 2 if quick else 12)]
    A5 = None
    for case, years in plans:
        t0 = time.time()
        md, state, p, yearly, Q_out, Q_src = run_case(case, years)
        if case == "A5":
            A5 = (md, state)
        imb = abs(Q_out - Q_src) / max(abs(Q_src), 1e-30)
        out[case] = {"input_ms": shmip.CASES_A[case], "years": years,
                     "yearly": yearly, "Q_out": Q_out, "Q_src": Q_src,
                     "Q_oracle": float(-p["q_margin"] * 20e3),
                     "imbalance": imb,
                     "wall_s": round(time.time() - t0, 1)}
        print(f"{case}: {json.dumps(out[case]['yearly'][-1])}", flush=True)
    return A5


class _Cache(dict):
    """Results cache that records which keys THIS process wrote, so a
    save can merge onto the on-disk state instead of clobbering it —
    suite S/O cases run for hours and it is easy (and useful) to have
    two invocations covering different cases in flight; a whole-dict
    rewrite from either one silently destroyed the other's finished
    cases (and resurrected keys deleted on disk meanwhile)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self._dirty = set()

    def __setitem__(self, key, value):
        super().__setitem__(key, value)
        self._dirty.add(key)


def _save_cache(out):
    """Persist the results cache AND re-render SHMIP.md NOW (suites S/O
    run for hours per case; an interrupted run must not lose completed
    cases, and the artifact should reflect them immediately).  Only the
    keys this process wrote are overlaid on the on-disk state; all other
    keys are adopted FROM disk (concurrent-invocation safety)."""
    dirty = getattr(out, "_dirty", None)
    if dirty is not None and os.path.exists(CACHE):
        try:
            with open(CACHE) as f:
                disk = json.load(f)
        except Exception:                       # pragma: no cover
            disk = {}
        merged = dict(disk)
        merged.update({k: out[k] for k in dirty if k in out})
        # sync the in-memory view to the merged state (including keys
        # another process deleted on disk) without marking it dirty
        for k in list(out.keys()):
            if k not in merged:
                dict.__delitem__(out, k)
        for k, v in merged.items():
            if k not in dirty:
                dict.__setitem__(out, k, v)
    with open(CACHE, "w") as f:
        json.dump(dict(out), f, indent=1)
    try:
        with open(os.path.join(ROOT, "SHMIP.md"), "w") as f:
            f.write("\n".join(build_md(out)) + "\n")
    except Exception as e:                      # pragma: no cover
        print(f"(markdown render deferred: {e})", flush=True)


# Per-case polish budgets: (max_newton_total, patience, max_wall_s).
# Evidence-scaled: A1/A2 polish in seconds; A3 has a TRUE fixed point
# but only past a ~21-segment wandering phase (measured: defect 0.017/yr
# at pseudo-year 25, rearrangement excursions 0.06-0.35/yr until ~yr 46,
# then convergence to 2.9e-7/yr at pseudo-year ~1920) so it needs the
# long patience; A6's defect decays geometrically through 1.6e-3/yr at
# 6000 iterations (certifies with budget).  A4/A5 under the short
# (8000, 4, 2400) budget gave up after 2.9/11.7 pseudo-years of
# wandering at ~0.2/yr with no exit — since A3 only exited its own
# wandering phase past ~21 segments, they get the same long-patience
# treatment: either they too exit to a fixed point, or the march
# samples enough pseudo-years for the stationary-attractor
# certificate (half-trajectory centroid drift) to resolve.
S_POLISH_BUDGET = {
    "A1": (6000, 3, 1800.0), "A2": (6000, 3, 1800.0),
    "A3": (40000, 30, 7200.0),
    "A4": (40000, 30, 7200.0), "A5": (40000, 30, 7200.0),
    "A6": (16000, 10, 3600.0),
}

# run order: cheap anchors first, then the headline A3 (transient twin)
# and the near-certified A6, the bounded stationary marches last — an
# interrupted run leaves the highest-value rows already re-rendered
# (each case saves cache + SHMIP.md on completion)
S_ORDER = ("A1", "A2", "A3", "A6", "A4", "A5")


def suite_S(out, quick, force=False, cases=None, budget_override=None):
    """Suite S (steady-solver cross-check): solve A1/A3/A5 DIRECTLY with
    md.solve_steady (pseudo-transient continuation, solve/steady.py) and
    judge against the same independent 1D oracle the transients are judged
    against.  Two entirely different routes — years of hourly marching vs
    a few hundred SER pseudo-steps — must land on the same steady state
    (compare relN_win here with suite A's), and each must conserve mass.

    A2/A4/A6 (not marched as transients in suite A) are solved here too,
    judged against the oracle alone — the steady route completes 6/6
    suite-A case coverage.  Cached cases are skipped (use --force or
    delete their "S_<case>" keys from scripts/shmip_results.json to
    re-run); each entry records the tol/max_steps/quick fidelity it was
    produced at, so a --quick refresh is distinguishable in the cache.

    ``cases`` restricts the run to a subset (CLI ``--cases A4,A5``);
    ``budget_override`` replaces the S_POLISH_BUDGET tuple for those
    runs (CLI ``--budget newton,patience,wall``) — for giving the
    hardest channelized marches the long-patience treatment that
    certified A3/A6 without re-running the whole suite."""
    print("== suite S: direct steady solves of A1-A6 ==", flush=True)
    tol = 1e-2 if quick else 1e-3
    max_steps = 6000 if quick else 30000
    for case in S_ORDER:
        if cases is not None and case not in cases:
            continue
        if "S_" + case in out and not force:
            print(f"S_{case}: cached, skipping (--force re-runs)",
                  flush=True)
            continue
        t0 = time.time()
        md = shmip.initialize(case, nx=60, ny=12, days=30, nt_per_day=24)
        # polish=True: the staggered PTC plateaus on channelized regimes
        # (A3-A6: the staggered b<->N instability pins its pseudo-dt near
        # 1e3 s while the slow modes relax over years), so the monolithic
        # coupled Newton (solve/monolithic.py) takes over and solves the
        # transient's own fixed-point equations directly — certifying the
        # equilibrium from the EQUATIONS (measured A3: plateau 0.39/yr ->
        # 3e-4/yr, and the reference-exact transient marched from the
        # polished state moves ~1e-9 relative in 10 h).  cycle_window
        # stays as the fallback verdict for any case the polish cannot
        # close.  verdict in {polished, steady, cycle, no}.
        budget = budget_override or S_POLISH_BUDGET[case]
        res = md.solve_steady(tol=tol, max_steps=max_steps, strict=False,
                              polish=True,
                              polish_max_newton=(6000 if quick
                                                 else budget[0]),
                              polish_patience=3 if quick else budget[1],
                              polish_max_wall_s=(900.0 if quick
                                                 else budget[2]),
                              cycle_window=150 if quick else 400)
        p = steady_profile(case)
        x = md.x
        No = np.interp(x, p["x"], p["N"])
        bo = np.interp(x, p["x"], p["b"])
        win = (x > WINDOW[0]) & (x < WINDOW[1])
        info = res["info"]
        Q_out, Q_src = float(res["Q_out"]), float(res["Q_src"])
        m = {"converged": bool(info["converged"]),
             "verdict": info.get("verdict",
                                 "steady" if info["converged"] else "no"),
             "polish_newton": info.get("polish_newton"),
             "polish_resN": info.get("polish_resN", float("nan")),
             "wander_rate": info.get("wander_rate", float("nan")),
             "wander_amp_N": info.get("wander_amp_N", float("nan")),
             "wander_amp_b": info.get("wander_amp_b", float("nan")),
             "t_march_yr": info.get("t_march_yr", float("nan")),
             "cycle_rate": info.get("cycle_rate", float("nan")),
             "cycle_amp_N": info.get("cycle_amp_N", float("nan")),
             "cycle_amp_b": info.get("cycle_amp_b", float("nan")),
             "tol": tol, "max_steps": max_steps, "quick": bool(quick),
             "ptc_steps": info["steps"], "newton": info["newton_total"],
             "drift_per_yr": info["rate"],
             "drift_bdry_per_yr": info["rate_b_bdry"],
             "relN_win": float(np.linalg.norm(res["N"][win] - No[win])
                               / np.linalg.norm(No[win])),
             "relb_win": float(np.linalg.norm(res["b"][win] - bo[win])
                               / np.linalg.norm(bo[win])),
             "Q_out": Q_out, "Q_src": Q_src,
             "imbalance": abs(Q_out - Q_src) / max(abs(Q_src), 1e-30),
             "wall_s": round(time.time() - t0, 1)}
        out["S_" + case] = m
        _save_cache(out)
        print(f"S_{case}: {json.dumps(m)}", flush=True)


def suite_O(out, quick, force=False):
    """Oracle triangle (independent-discretization anchoring).

    VERDICT r3 weak #2: suite A/S accuracy was anchored only against the
    builder's own 1D shooting oracle — self-built oracle + self-built
    model can share a blind spot.  The published per-model SHMIP result
    distributions (de Fleurian et al. 2018) are NOT redistributable and
    not retrievable in this offline environment (PAPERS.md carries no
    SHMIP tables), so instead of transcribing an envelope from memory —
    which would fabricate data — this suite closes the loop with a THIRD,
    fully independent implementation: `oracle/shmip_fv2d.py`, a
    cell-centered finite-volume discretization (harmonic-mean face
    transmissivities) assembled with scipy.sparse and solved by direct
    LU — sharing no code, no discretization (FV vs P1 FEM), no linear
    algebra, and no language layer (numpy/scipy vs JAX) with the
    framework.  Two legs:

    * uniform leg: the FV column Newton (`steady_column_newton`, exact
      damped Newton on the coupled steady system) vs the 1D shooting
      oracle, all six cases — two independent steady solvers agreeing
      anchors both oracles' numerics;
    * channelized leg: the FV 2D pseudo-time `march` develops the SAME
      sheet-channel instability the FEM transient does, on its own grid.
      Its window deviation from the y-uniform state independently bounds
      the FEM's suite-A window deviation (the "channelization y-spread"
      explanation, now measured rather than asserted).
    """
    print("== suite O: oracle triangle (1D shooting / 2D FV / FEM) ==",
          flush=True)
    import oracle.shmip_fv2d as fv2d
    nx = 100 if quick else 200
    if "O_ladder" not in out or force:
        t0 = time.time()
        ladder = fv2d.solve_ladder(nx=nx)
        rows = {}
        for case, r in ladder.items():
            p = steady_profile(case)
            win = (r["x"] > WINDOW[0]) & (r["x"] < WINDOW[1])
            No = np.interp(r["x"], p["x"], p["N"])
            bo = np.interp(r["x"], p["x"], p["b"])
            rows[case] = {
                "converged": bool(r["converged"]),
                "newton": int(r["newton"]),
                "relN_fv_1d": float(
                    np.linalg.norm(r["N"][win] - No[win])
                    / np.linalg.norm(No[win])),
                "relb_fv_1d": float(
                    np.linalg.norm(r["b"][win] - bo[win])
                    / np.linalg.norm(bo[win])),
            }
            print(f"O_{case}: {json.dumps(rows[case])}", flush=True)
        out["O_ladder"] = {"nx": nx, "rows": rows,
                           "wall_s": round(time.time() - t0, 1)}
        _save_cache(out)
    # march legs on the FEM run's own resolution (60x12 over the same
    # 100x20 km domain), A3/A5 only — the channelized cases whose
    # column-Newton uniform baseline is clean at this resolution (the
    # low-input cases A1/A2 need finer grids: their near-floor gap makes
    # the coarse coupled Newton oscillatory).  Two legs per case:
    #
    # * STABILITY leg (O_stab_*): perturb the uniform branch by 10% gap
    #   noise and integrate 2 yr — does the independent FV dynamics
    #   KEEP the y-uniform state (FEM channelization would then be a
    #   discretization artifact) or grow y-structure (channelization
    #   onset confirmed independent of the FEM discretization)?
    # * PROTOCOL leg (O_march_*): the FEM transient's own cold-noise IC
    #   (b = 0.01, 50% log-noise, N = overburden/2) over the full
    #   suite-A horizon — the FV march's window deviation from the
    #   uniform branch is the independent same-axis bound for the FEM's
    #   suite-A relN_win/relb_win (both measured against the uniform
    #   steady profile).
    def _march_metrics(m, u):
        win = (m["x"] > WINDOW[0]) & (m["x"] < WINDOW[1])
        Nu = np.interp(m["x"], u["x"], u["N"])
        bu = np.interp(m["x"], u["x"], u["b"])
        return {
            "years": m["t_years"], "steps": m["steps"],
            "yspread_N": float(m["yspread_N"]),
            "frac_b_floor": float(m["frac_b_floor"]),
            "relN_march_uniform": float(
                np.linalg.norm(m["N"][win] - Nu[win])
                / np.linalg.norm(Nu[win])),
            "relb_march_uniform": float(
                np.linalg.norm(m["b"][win] - bu[win])
                / np.linalg.norm(bu[win])),
        }

    # horizons: the channelized attractor's statistics saturate fast
    # (measured A5: y-spread plateaus at ~1.1-1.3 MPa by t=0.4 yr), and
    # the explicit march pays ~dt=500 s through the channelized state's
    # fast internal dynamics — the FEM's 10-12 yr horizon would be
    # ~15 h/case here for no extra information; 3 yr ~ 6 plateau
    # e-foldings of margin
    for case, years in (("A3", 3.0), ("A5", 3.0)):
        need = [k for k in ("O_stab_" + case, "O_march_" + case)
                if k not in out or force]
        if not need:
            continue
        u = fv2d.steady_column_newton(case, nx=60)
        assert u["converged"], (case, "uniform baseline did not converge")
        if "O_stab_" + case in need:
            t0 = time.time()
            m = fv2d.march(case, nx=60, ny=12, years=1.0 if quick else 2.0,
                           noise=0.10, b_init=u["b"], N_init=u["N"], seed=0)
            out["O_stab_" + case] = dict(_march_metrics(m, u),
                                         wall_s=round(time.time() - t0, 1))
            _save_cache(out)
            print(f"O_stab_{case}: {json.dumps(out['O_stab_' + case])}",
                  flush=True)
        if "O_march_" + case in need:
            t0 = time.time()
            m = fv2d.march(case, nx=60, ny=12,
                           years=2.0 if quick else years, seed=0)
            out["O_march_" + case] = dict(_march_metrics(m, u),
                                          wall_s=round(time.time() - t0, 1))
            _save_cache(out)
            print(f"O_march_{case}: {json.dumps(out['O_march_' + case])}",
                  flush=True)


def suite_OT(out, quick, force=False, cases=None):
    """Transient oracle legs (VERDICT r4 item 3): the FV oracle's march
    mode under the SAME time-dependent forcing as suites C (diurnal
    moulin scaling) and D (seasonal degree-day melt), cross-checking the
    cycle statistics of the window-mean N against the framework — the
    suites that were previously validated only by internal consistency
    (monotonicity + conservation) gain an independent implementation on
    a time-FORCED trajectory.  The FV march shares no code, grid, or
    linear algebra with the FEM (oracle/shmip_fv2d.py module docstring);
    agreement is expected at the tens-of-percent level (different
    discretizations of a channelizing system), so the anchored claims
    are: cycle AMPLITUDE within a factor ~2, monotone amplitude growth
    with forcing strength, the winter/summer phase, and — for suite D —
    the SIGN of the summer minimum (the artesian excursion, VERDICT r4
    weak #4: the FV march permits N < 0 through its per-cell physical
    band, so a negative summer window-mean is confirmed physics, not a
    framework artifact)."""
    import oracle.shmip_fv2d as fv2d

    T_YR = 3.154e7              # make_forcing's degree-day default period
    day_fw = T_YR / 365.0
    YEAR_FV = 3.1536e7          # fv2d.march's own year unit

    # ---- suite D leg: seasonal degree-day forcing, framework grid ----
    ddf, lapse = 0.01 / 86400.0, 0.0075
    base = shmip.CASES_A["A1"]
    for case in ("D1", "D3", "D5"):
        key = "OT_" + case
        if cases is not None and case not in cases:
            continue
        if (key in out and not force) or case not in out:
            continue
        dT = shmip.CASES_D[case]
        nx, ny = (60, 12) if quick else (100, 20)
        # spin is NOT reduced in quick mode: a 1-year spin leaves the
        # cold-started gap far from the seasonal attractor and the
        # winter branch reads ~3x high (measured: D1 winter 1.66 MPa
        # after 1 spin year vs the FV A1 steady 0.34 MPa on the same
        # 60x12 grid); 3 cycles reach cyclostationarity
        zs2 = np.broadcast_to(
            fv2d.surface((np.arange(nx) + 0.5) * (fv2d.LX / nx))[None, :],
            (ny, nx))

        def inp(t, dT=dT, zs2=zs2):
            temp = -5.0 - 16.0 * np.cos(2.0 * np.pi * t / T_YR) + dT
            return base + np.maximum(0.0, ddf * temp - ddf * lapse * zs2)

        spin = 3
        days = np.r_[10.0 * (np.arange(36) + 1), 365.0]
        samp = spin * T_YR + day_fw * days
        t0 = time.time()
        # rel_pctile: the melt-season channelization front flickers a
        # small cell population about the floor; controlling dt on the
        # max pinned it at minutes through every summer (the valley-leg
        # lesson, oracle/shmip_fv2d.py march docstring) — the first OT
        # attempt sat >7 h inside D1's year-1 summer.  98th percentile
        # rides dt_max except at genuine transitions.
        m = fv2d.march(case, nx=nx, ny=ny,
                       years=(spin + 1) * T_YR / YEAR_FV + 0.01,
                       dt_max=day_fw / 2.0, seed=0, input_rate=inp,
                       sample_times=samp, rel_pctile=98.0, verbose=500)
        s, smin = m["samples"], m["samples_min"]
        fw = out[case]
        amp = float((s.max() - s.min()) / 1e6)
        met = {
            "dT": dT, "grid": [nx, ny], "spin_years": spin,
            "steps": m["steps"],
            "N_winter_MPa": float(s.max() / 1e6),
            "N_summer_min_MPa": float(s.min() / 1e6),
            "N_amp_MPa": amp,
            "N_cellmin_MPa": float(smin.min() / 1e6),
            "fw_N_winter_MPa": fw["N_winter_MPa"],
            "fw_N_summer_min_MPa": fw["N_summer_min_MPa"],
            "fw_N_amp_MPa": fw["N_amp_MPa"],
            "rel_amp_err": abs(amp - fw["N_amp_MPa"])
            / max(abs(fw["N_amp_MPa"]), 1e-12),
            "rel_winter_err": abs(float(s.max() / 1e6)
                                  - fw["N_winter_MPa"])
            / max(abs(fw["N_winter_MPa"]), 1e-12),
            "summer_sign_agrees": bool(
                (s.min() < 0) == (fw["N_summer_min_MPa"] < 0)),
            "wall_s": round(time.time() - t0, 1),
        }
        out[key] = met
        _save_cache(out)
        print(f"{key}: {json.dumps(met)}", flush=True)

    # ---- suite C leg: diurnal scaling of the B5 moulin input ----
    nx, ny = 60, 12                      # the framework's suite-C grid
    dxc, dyc = fv2d.LX / nx, fv2d.LY / ny
    field = np.full((ny, nx), base)
    rate = shmip.B_TOTAL_M3S / shmip.CASES_B["B5"]
    for (mx, my) in shmip.moulin_positions(shmip.CASES_B["B5"],
                                           fv2d.LX, fv2d.LY):
        field[min(int(my / dyc), ny - 1),
              min(int(mx / dxc), nx - 1)] += rate / (dxc * dyc)
    spin_state = None
    for case in ("C2", "C4"):
        key = "OT_" + case
        if cases is not None and case not in cases:
            continue
        if (key in out and not force) or case not in out:
            continue
        if spin_state is None:
            t0 = time.time()
            spin_years = 2.0 if quick else 3.0
            sp = fv2d.march(case, nx=nx, ny=ny, years=spin_years,
                            dt_max=2 * 86400.0, seed=0,
                            input_rate=lambda t: field,
                            rel_pctile=98.0, verbose=500)
            spin_state = (sp["b2d"], sp["N2d"])
            print(f"OT_C spin: {sp['steps']} steps "
                  f"{round(time.time() - t0, 1)} s", flush=True)
        Ra = shmip.CASES_C[case]

        def inp_c(t, Ra=Ra):
            return field * max(0.0, 1.0 + Ra * np.sin(
                2.0 * np.pi * t / shmip.DAY_S))

        c_days = 6 if quick else 10
        samp = (c_days - 2) * 86400.0 + 1800.0 * (np.arange(96) + 1)
        t0 = time.time()
        m = fv2d.march(case, nx=nx, ny=ny,
                       years=c_days * 86400.0 / YEAR_FV + 1e-4,
                       dt0=900.0, dt_max=1800.0, noise=0.0,
                       b_init=spin_state[0], N_init=spin_state[1],
                       seed=0, input_rate=inp_c, sample_times=samp,
                       rel_pctile=98.0, verbose=500)
        s = m["samples"]
        fw = out[case]
        amp = float((s.max() - s.min()) / 1e6)
        met = {
            "Ra": Ra, "grid": [nx, ny], "steps": m["steps"],
            "N_mean_cycle": float(s.mean()),
            "N_amp_MPa": amp,
            "fw_N_mean_cycle": fw["N_mean_cycle"],
            "fw_N_amp_MPa": fw["N_amp_MPa"],
            "rel_amp_err": abs(amp - fw["N_amp_MPa"])
            / max(abs(fw["N_amp_MPa"]), 1e-12),
            "wall_s": round(time.time() - t0, 1),
        }
        out[key] = met
        _save_cache(out)
        print(f"{key}: {json.dumps(met)}", flush=True)


def suite_OV(out, quick, force=False):
    """Valley-geometry oracle leg (VERDICT r4 item 4): the FV oracle's
    masked variable-geometry grid (oracle/shmip_fv2d.valley_grid) marches
    the suite-E 'bench' valley ladder to steady state under the same
    E_INPUT forcing — the suites E/F geometry previously rested on one
    implementation.  Anchored claims (tens-of-percent agreement expected
    between a masked structured FV grid and the 75 m unstructured FEM
    footprint):

    * the monotone overdeepening trend: trough-band mean N GROWS as
      para deepens the mid-glacier trough (E1 -> E5), in both codes;
    * absolute trough/mean N within a factor ~2 case by case;
    * VALLEY_B_CAP insensitivity: re-solving the deepest case (E5) with
      the gap cap at 2 m instead of 0.5 m must not move N over the
      interior (ice column >= 50 m — the cap binds only in the thin
      terminus strip where the sheet approximation is meaningless;
      setups/setup_shmip.py VALLEY_B_CAP note)."""
    import oracle.shmip_fv2d as fv2d
    nx, ny = (48, 12) if quick else (60, 16)
    years = 3.0
    ecases = ("E1", "E2", "E3", "E4", "E5")
    x0 = None
    for case in ecases:
        key = "OV_" + case
        if (key in out and not force) or case not in out:
            continue
        t0 = time.time()
        r = fv2d.valley_steady(shmip.CASES_E[case], nx=nx, ny=ny,
                               years=years, x0=x0)
        # ladder continuation: warm-start the next (deeper) case from
        # this steady state — the cold start is most of the march
        x0 = (r["N2d"], r["b2d"])
        fw = out[case]
        met = {k: v for k, v in r.items()
               if k not in ("N2d", "b2d", "mask", "thick", "xc")}
        met.update({
            "fw_N_mean_MPa": fw["N_mean_MPa"],
            "fw_N_trough_MPa": fw["N_trough_MPa"],
            "fw_b_trough_mm": fw["b_trough_mm"],
            "rel_trough_err": abs(r["N_trough_MPa"] - fw["N_trough_MPa"])
            / max(abs(fw["N_trough_MPa"]), 1e-12),
            "rel_mean_err": abs(r["N_mean_MPa"] - fw["N_mean_MPa"])
            / max(abs(fw["N_mean_MPa"]), 1e-12),
            "wall_s": round(time.time() - t0, 1)})
        out[key] = met
        _save_cache(out)
        print(f"{key}: {json.dumps(met)}", flush=True)
    if all(("OV_" + c) in out for c in ecases):
        tr = [out["OV_" + c]["N_trough_MPa"] for c in ecases]
        fw_tr = [out["OV_" + c]["fw_N_trough_MPa"] for c in ecases]
        out["OV_trend"] = {
            "oracle_trough_MPa": tr, "fw_trough_MPa": fw_tr,
            "oracle_monotonic": bool(np.all(np.diff(tr) > 0)),
            "fw_monotonic": bool(np.all(np.diff(fw_tr) > 0))}
        _save_cache(out)
        print(f"OV_trend: {json.dumps(out['OV_trend'])}", flush=True)
    # stationarity leg (scripts/valley_stationarity.py writes its result
    # next to this script; fold it into the cache so the renderer sees it)
    stat_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "valley_stationarity.json")
    if os.path.exists(stat_path) and (
            "OV_stationarity" not in out or force):
        with open(stat_path) as f:
            out["OV_stationarity"] = json.load(f)
        _save_cache(out)
    # cap sensitivity: E5 with the cap relaxed 0.5 -> 2 m
    if "OV_cap" not in out or force:
        t0 = time.time()
        r1 = fv2d.valley_steady(shmip.CASES_E["E5"], nx=nx, ny=ny,
                                years=years, b_cap=0.5, x0=x0)
        r2 = fv2d.valley_steady(shmip.CASES_E["E5"], nx=nx, ny=ny,
                                years=years, b_cap=2.0, x0=x0)
        interior = r1["mask"] & (r1["thick"] >= 50.0)
        dN = (np.linalg.norm(r1["N2d"][interior] - r2["N2d"][interior])
              / np.linalg.norm(r1["N2d"][interior]))
        out["OV_cap"] = {
            "case": "E5", "caps_m": [0.5, 2.0],
            "relN_interior": float(dN),
            "frac_cap_05": r1["frac_cap"], "frac_cap_20": r2["frac_cap"],
            "N_trough_MPa_05": r1["N_trough_MPa"],
            "N_trough_MPa_20": r2["N_trough_MPa"],
            "wall_s": round(time.time() - t0, 1)}
        _save_cache(out)
        print(f"OV_cap: {json.dumps(out['OV_cap'])}", flush=True)


def suite_artesian(out, quick, force=False):
    """Artesian-regime study (VERDICT r4 item 5): suites D/F report
    summer-minimum window-mean N down to -0.76 MPa — water pressure
    above overburden.  SHAKTI's closure is SIGNED by construction
    (N |N|^{n-1}, reference constitutive.py:29-31): under N < 0 creep
    OPENS the gap, a physical negative feedback that drains the
    over-pressurized sheet — so transient artesian excursions are
    intended physics, not blowup.  This probe quantifies WHERE and WHEN
    N < 0 occurs on the strongest seasonal case (D5): per 10-day sample
    of the final forced year it records the negative-node fraction, the
    worst N (absolute and relative to local overburden), and the
    along-flow extent; the FV oracle's march under the same forcing
    (suite OT) independently reproduces the excursion's sign and
    magnitude.  Policy: ALLOW + FLAG — no artificial N floor (the
    reference has none either), and the production run log carries a
    per-save N_min column (api/run.py log.csv) so excursions are
    visible in every run."""
    key = "artesian_D5"
    if key in out and not force:
        return
    case = "D5"
    spin = 1 if quick else 3
    nt_per_day = 4
    years = spin + 1
    t0 = time.time()
    md = shmip.initialize(case, days=365 * years, nt_per_day=nt_per_day)
    mesh, static, state, cfg = md.freeze()
    step = make_step_fn(mesh, static, md.params, cfg)
    forcing = make_forcing(md.timesteps, dtype=md.dtype,
                           degree_day=md.degree_day)
    runner = jax.jit(lambda s, f: run_window(step, s, f))
    take = lambda i, j: jax.tree_util.tree_map(lambda a: a[i:j], forcing)
    nt = md.timesteps.size
    W = 365 * nt_per_day
    i0 = spin * W
    win = (md.x > WINDOW[0]) & (md.x < WINDOW[1])
    p_i = md.params.rho_i * md.params.g * np.maximum(md.z_s - md.z_b, 1.0)
    state, dstep = runner(state, take(0, i0))
    conv = bool(np.asarray(dstep["converged"]).all())
    Wd = 10 * nt_per_day
    rows = []
    for k in range(i0, nt, Wd):
        state, dstep = runner(state, take(k, min(k + Wd, nt)))
        conv = conv and bool(np.asarray(dstep["converged"]).all())
        N = np.asarray(state.N)
        neg = N < 0.0
        rows.append({
            "day": (k + Wd - i0) // nt_per_day,
            "frac_neg": float(neg.mean()),
            "winmean_MPa": float(N[win].mean() / 1e6),
            "N_min_MPa": float(N.min() / 1e6),
            "min_over_pi": float((N / p_i).min()),
            "x_neg_km": ([float(md.x[neg].min() / 1e3),
                          float(md.x[neg].max() / 1e3)]
                         if neg.any() else None),
        })
    frac = np.array([r["frac_neg"] for r in rows])
    wm = np.array([r["winmean_MPa"] for r in rows])
    imin = int(np.argmin([r["N_min_MPa"] for r in rows]))
    met = {
        "case": case, "spin_years": spin, "converged": conv,
        "samples_days": 10,
        "days_any_neg": int((frac > 0).sum()) * 10,
        "days_winmean_neg": int((wm < 0).sum()) * 10,
        "frac_neg_max": float(frac.max()),
        "N_min_MPa": rows[imin]["N_min_MPa"],
        "min_over_pi": float(min(r["min_over_pi"] for r in rows)),
        "worst_day": rows[imin]["day"],
        "x_neg_km_at_worst": rows[imin]["x_neg_km"],
        "rows": rows,
        "wall_s": round(time.time() - t0, 1),
    }
    out[key] = met
    _save_cache(out)
    print(f"{key}: {json.dumps({k: v for k, v in met.items() if k != 'rows'})}",
          flush=True)


def suite_B(out, quick, A5):
    A5_md, A5_state = A5
    xs_a5, prof_a5 = ymean_profile(A5_md, np.asarray(A5_state.N))
    win_x = (xs_a5 > WINDOW[0]) & (xs_a5 < WINDOW[1])
    b_years = 2 if quick else 5
    B5_state = None
    for case in ("B1", "B2", "B3", "B4", "B5"):
        t0 = time.time()
        md, state, Q_out, Q_src, conv = run_b_case(case, b_years)
        if case == "B5":
            B5_state = state
        xs, prof = ymean_profile(md, np.asarray(state.N))
        relA5 = float(np.linalg.norm(prof[win_x] - prof_a5[win_x])
                      / np.linalg.norm(prof_a5[win_x]))
        imb = abs(Q_out - Q_src) / max(abs(Q_src), 1e-30)
        win = (md.x > WINDOW[0]) & (md.x < WINDOW[1])
        out[case] = {"moulins": shmip.CASES_B[case], "years": b_years,
                     "winN_MPa": float(np.asarray(state.N)[win].mean() / 1e6),
                     "relN_vs_A5": relA5, "Q_out": Q_out, "Q_src": Q_src,
                     "imbalance": imb, "converged": conv,
                     "wall_s": round(time.time() - t0, 1)}
        print(f"{case}: {json.dumps(out[case])}", flush=True)
    return B5_state


def suite_C(out, quick, B5_state):
    amps = []
    c_days = 6 if quick else 10
    for case in ("C1", "C2", "C3", "C4"):
        t0 = time.time()
        md, m = run_c_case(case, B5_state, days=c_days)
        m["wall_s"] = round(time.time() - t0, 1)
        out[case] = m
        amps.append(m["N_amp_MPa"])
        print(f"{case}: {json.dumps(m)}", flush=True)
    out["C_amplitude_monotonic"] = bool(np.all(np.diff(amps) > 0))


def suite_D(out, quick):
    spin = 1 if quick else 3
    amps = []
    for case in ("D1", "D2", "D3", "D4", "D5"):
        t0 = time.time()
        md, state, samples, conv, Q_out, Q_src = run_seasonal_case(
            case, spin_years=spin)
        imb = abs(Q_out - Q_src) / max(abs(Q_src), 1e-30)
        m = {"dT": shmip.CASES_D[case], "spin_years": spin,
             "N_winter_MPa": float(samples.max() / 1e6),
             "N_summer_min_MPa": float(samples.min() / 1e6),
             "N_amp_MPa": float((samples.max() - samples.min()) / 1e6),
             "Q_out": Q_out, "Q_src": Q_src, "imbalance": imb,
             "converged": conv, "wall_s": round(time.time() - t0, 1)}
        out[case] = m
        amps.append(m["N_amp_MPa"])
        print(f"{case}: {json.dumps(m)}", flush=True)
    out["D_amplitude_monotonic"] = bool(np.all(np.diff(amps) > 0))


def suite_E(out, quick):
    years = 0.5 if quick else 1.0
    for case in ("E1", "E2", "E3", "E4", "E5"):
        t0 = time.time()
        md, state, steady_rel, conv, Q_out, Q_src = run_e_case(
            case, years=years)
        N = np.asarray(state.N)
        trough = (md.x > 2e3) & (md.x < 4e3)
        imb = abs(Q_out - Q_src) / max(abs(Q_src), 1e-30)
        m = {"para": shmip.CASES_E[case], "n_nodes": int(md.x.size),
             "N_mean_MPa": float(N.mean() / 1e6),
             "N_trough_MPa": float(N[trough].mean() / 1e6),
             "b_trough_mm": float(np.asarray(state.b)[trough].mean() * 1e3),
             "steady_rel_30d": steady_rel,
             "Q_out": Q_out, "Q_src": Q_src, "imbalance": imb,
             "converged": conv, "wall_s": round(time.time() - t0, 1)}
        out[case] = m
        print(f"{case}: {json.dumps(m)}", flush=True)


def suite_F(out, quick):
    spin = 0 if quick else 1
    amps = []
    for case in ("F1", "F2", "F3", "F4", "F5"):
        t0 = time.time()
        md, state, samples, conv, Q_out, Q_src = run_seasonal_case(
            case, spin_years=spin, nt_per_day=24)
        m = {"dT": shmip.CASES_F[case],
             "N_winter_MPa": float(samples.max() / 1e6),
             "N_summer_min_MPa": float(samples.min() / 1e6),
             "N_amp_MPa": float((samples.max() - samples.min()) / 1e6),
             "converged": conv, "wall_s": round(time.time() - t0, 1)}
        out[case] = m
        amps.append(m["N_amp_MPa"])
        print(f"{case}: {json.dumps(m)}", flush=True)
    out["F_amplitude_monotonic"] = bool(np.all(np.diff(amps) > 0))


# ------------------------------------------------------------- markdown

def build_md(out):
    g = lambda c, k: out[c][k]
    lines = ["# SHMIP validation (suites A-F + S + oracle triangle)", ""]
    # every suite block is gated on its results being present (the cache
    # file may hold a subset when regenerated with --suites), mirroring
    # the D/E/F guards below — an ungated KeyError here would throw away
    # hours of suite compute at the final rewrite
    if "A5" in out:
        lines += [
            "## Suite A (distributed input)",
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
        for c in ("A1", "A3", "A5"):
            last = out[c]["yearly"][-1]
            lines.append(
                f"| {c} | {shmip.CASES_A[c]:.3g} | {g(c, 'years')} "
                f"| {last['relN_win']:.2e} | {last['relb_win']:.2e} "
                f"| {last['yspread_50km']:.3f} "
                f"| {g(c, 'Q_out'):.3f} | {g(c, 'Q_src'):.3f} "
                f"| {g(c, 'imbalance'):.1e} |")
    if any("S_" + c in out for c in ("A1", "A2", "A3", "A4", "A5", "A6")):
        lines += [
            "",
            "## Suite S (direct steady solves — PTC cross-check)",
            "",
            "The suite-A equilibria (all six cases) found DIRECTLY by the",
            "pseudo-transient-continuation steady solver (`md.solve_steady`,",
            "`solve/steady.py` — a capability the reference lacks), judged",
            "against the same independent 1D oracle as suite A: two",
            "disjoint routes (years of hourly marching vs a few thousand",
            "SER pseudo-steps) landing on the same state, each conserving",
            "mass.  The drift certificate excludes the N-pinned margin",
            "nodes (N_bdry ~ 9 kPa -> closure timescale ~19,000 yr: no",
            "reachable gap equilibrium there — the transient route has the",
            "identical linear margin drift; their residual drift is the",
            "`bdry` column).  Verdicts are CONCLUSIVE for every case:",
            "`polished` means the monolithic coupled Newton",
            "(`solve/monolithic.py`) solved the transient's own",
            "fixed-point equations directly — the drift column is then",
            "the EQUATION-level defect rate, and the reference-exact",
            "transient marched from the state moves ~1e-9 relative in",
            "10 h (the staggered PTC alone plateaus at 0.4-3.5/yr on the",
            "channelized cases: its b<->N splitting instability pins the",
            "pseudo-dt near 1e3 s; the implicit coupling grows it to",
            "~1e9 s).  `steady` means the PTC drift certificate fired;",
            "`cycle` means the limit-cycle certificate fired instead",
            "(`solve/steady.cycle_certify`: two consecutive window means",
            "of the orbit agree to tol/yr, the reported state is the",
            "CYCLE MEAN, `amp` columns give the relative RMS cycle",
            "amplitude).  `stationary` means no fixed point is reachable",
            "but the monolithic march sampled enough pseudo-years to",
            "certify the ATTRACTOR: channel-rearrangement events recur",
            "(measured A3: the defect decays 0.39 -> 0.02/yr over ~25",
            "pseudo-years, then 2-5x excursions), yet the trajectory",
            "centroid is stationary to tol — the drift column is then the",
            "half-trajectory centroid rate, the `amp` columns the RMS",
            "wander around the time mean, and the reported state IS that",
            "time mean.  A2/A4/A6 have no transient twin in suite A;",
            "their oracle window errors complete 6/6 suite-A case",
            "coverage via the steady route.",
            "",
            "| case | verdict | PTC steps | Newton | drift [/yr] "
            "| amp N | amp b "
            "| relN (window) | relb (window) | Q_out [m^3/s] | "
            "Q_src [m^3/s] | imbalance | wall [s] |",
            "|---|---|---|---|---|---|---|---|---|---|---|---|---|",
        ]
        for c in ("A1", "A2", "A3", "A4", "A5", "A6"):
            if "S_" + c not in out:
                continue
            s = out["S_" + c]
            verdict = s.get("verdict",
                            "steady" if s["converged"] else "no")
            drift = (s["cycle_rate"] if verdict == "cycle"
                     else s.get("wander_rate", float("nan"))
                     if verdict == "stationary"
                     else s["drift_per_yr"])
            ampN = (s.get("wander_amp_N", float("nan"))
                    if verdict == "stationary"
                    else s.get("cycle_amp_N", float("nan")))
            ampb = (s.get("wander_amp_b", float("nan"))
                    if verdict == "stationary"
                    else s.get("cycle_amp_b", float("nan")))
            fmt_amp = (lambda v: f"{v:.2e}"
                       if np.isfinite(v) else "-")
            lines.append(
                f"| {c} | {verdict} "
                f"| {s['ptc_steps']} | {s['newton']} "
                f"| {drift:.1e} "
                f"| {fmt_amp(ampN)} "
                f"| {fmt_amp(ampb)} "
                f"| {s['relN_win']:.2e} "
                f"| {s['relb_win']:.2e} | {s['Q_out']:.3f} "
                f"| {s['Q_src']:.3f} | {s['imbalance']:.1e} "
                f"| {s['wall_s']:.0f} |")
    if "O_ladder" in out:
        lines += [
            "",
            "## Oracle triangle (independent discretizations)",
            "",
            "Three independent implementations of the same physics",
            "(Sommers et al. 2018 eqs. 1-6): the framework (P1 FEM, JAX,",
            "matrix-free Newton-Krylov), the 1D shooting oracle",
            "(`oracle/shmip_oracle.py`, scipy BVP), and a cell-centered",
            "finite-volume solver (`oracle/shmip_fv2d.py`, scipy.sparse",
            "direct LU, harmonic-mean face transmissivities) sharing no",
            "code, discretization, linear algebra, or language layer",
            "with either.  The published per-model SHMIP distributions",
            "(de Fleurian et al. 2018) are not redistributable and not",
            "retrievable offline, so the envelope check is replaced by",
            "this triangle: agreement between independent legs rules out",
            "a shared blind spot more sharply than an inter-model spread",
            "band (the paper reports the 13 participating models differ",
            "in mean N by factors of several).",
            "",
            "Uniform leg — FV column Newton vs 1D shooting oracle, window",
            "x in [30, 90] km (two independent steady solvers; their",
            "agreement anchors both oracles' numerics at O(h) FV",
            f"accuracy, nx={out['O_ladder']['nx']}):",
            "",
            "| case | FV converged | FV Newton | relN (FV vs 1D) | "
            "relb (FV vs 1D) |",
            "|---|---|---|---|---|",
        ]
        for c in ("A1", "A2", "A3", "A4", "A5", "A6"):
            r = out["O_ladder"]["rows"].get(c)
            if r is None:
                continue
            lines.append(
                f"| {c} | {'yes' if r['converged'] else 'no'} "
                f"| {r['newton']} | {r['relN_fv_1d']:.2e} "
                f"| {r['relb_fv_1d']:.2e} |")
        if any("O_stab_" + c in out or "O_march_" + c in out
               for c in ("A3", "A5")):
            lines += [
                "",
                "March legs — the FV 2D pseudo-time march integrates the",
                "PHYSICAL gap dynamics (quasi-static head system converged",
                "per step) on the FEM run's own 60x12 resolution, for the",
                "two channelized cases whose uniform baseline is clean at",
                "this resolution.  The STABILITY leg starts at the",
                "column-Newton uniform steady state + 10% gap noise: if",
                "the y-uniform branch were dynamically stable under this",
                "independent discretization, the FEM's channelized",
                "deviations would be suspect as discretization artifacts.",
                "The PROTOCOL leg starts from the FEM transient's own",
                "cold-noise IC (3 yr — the channelized statistics",
                "saturate within ~0.5 yr, and the explicit march pays",
                "dt~500 s through the channelized state's fast internal",
                "dynamics, so the FEM's 10-12 yr horizon buys nothing",
                "here): its",
                "window deviation from the uniform branch is the",
                "independent same-axis bound for the FEM's suite-A",
                "relN_win/relb_win (both measured against the y-uniform",
                "steady profile).  (r4 fix: the original march carried a",
                "recharge-sign bug — recharge acted as drainage, so every",
                "march collapsed into a sealed degenerate basin and the",
                "first rendering of this leg was wrong; the fixed",
                "equations reproduce the column-Newton steady state at",
                "the uniform branch to the O(h) gap between the two flux",
                "discretizations.)",
                "",
                "| case | leg | years | relN vs uniform | "
                "relb vs uniform | y-spread N [MPa] | b at floor | "
                "FEM relN (suite A) | FEM relb (suite A) |",
                "|---|---|---|---|---|---|---|---|---|",
            ]
            for c in ("A3", "A5"):
                fem = (out[c]["yearly"][-1] if c in out else None)
                femN = f"{fem['relN_win']:.2e}" if fem else "-"
                femb = f"{fem['relb_win']:.2e}" if fem else "-"
                for leg, k in (("stability", "O_stab_" + c),
                               ("protocol", "O_march_" + c)):
                    if k not in out:
                        continue
                    m = out[k]
                    lines.append(
                        f"| {c} | {leg} | {m['years']:.1f} "
                        f"| {m['relN_march_uniform']:.2e} "
                        f"| {m['relb_march_uniform']:.2e} "
                        f"| {m['yspread_N'] / 1e6:.3f} "
                        f"| {m.get('frac_b_floor', float('nan')) * 100:.0f}% "
                        f"| {femN} | {femb} |")
            stab = [out["O_stab_" + c] for c in ("A3", "A5")
                    if "O_stab_" + c in out]
            if stab:
                grew = all(s["yspread_N"] > 10 * 0.10 * 1e5 for s in stab)
                lines += [
                    "",
                    ("Measured verdict: the y-uniform branch is "
                     "dynamically UNSTABLE under the independent FV "
                     "dynamics at this resolution — y-structure grows "
                     "from 10% gap noise (y-spread column), so "
                     "channelization onset is a property of the "
                     "equations, not of the P1 FEM discretization; the "
                     "FEM's suite-A window deviations from the y-uniform "
                     "oracle measure that self-organization."
                     if grew else
                     "Measured verdict: the y-uniform branch held "
                     "y-uniform under the FV dynamics at this resolution "
                     "— channelization onset at 60x12 is "
                     "discretization-dependent; the FEM's suite-A window "
                     "deviations measure its own lateral "
                     "self-organization relative to a branch the FV "
                     "scheme keeps."),
                ]
        if any(("OT_" + c) in out for c in
               ("C2", "C4", "D1", "D3", "D5")):
            lines += [
                "",
                "Transient legs — the FV march driven by the SAME",
                "time-dependent forcing as suites C (diurnal moulin",
                "scaling, final-2-cycle amplitude of window-mean N) and D",
                "(seasonal degree-day melt, final-year winter max / summer",
                "min / amplitude): the previously self-referential",
                "time-FORCED suites cross-checked against an independent",
                "implementation.  Expected agreement is tens of percent",
                "(independent discretizations of a channelizing system);",
                "the anchored claims are amplitude scale (factor ~2),",
                "monotone growth with forcing strength, winter/summer",
                "phase, and the suite-D summer-minimum SIGN (negative =",
                "artesian excursion — the FV march permits N < 0 through",
                "its per-cell physical band, independently confirming the",
                "framework's N < 0 summers as physics, not artifact).",
                "",
                "| case | forcing | FV amp [MPa] | FEM amp [MPa] | "
                "rel err | FV winter [MPa] | FEM winter [MPa] | "
                "FV summer min [MPa] | FEM summer min [MPa] | "
                "summer sign agrees |",
                "|---|---|---|---|---|---|---|---|---|---|",
            ]
            for c in ("C2", "C4", "D1", "D3", "D5"):
                k = "OT_" + c
                if k not in out:
                    continue
                m = out[k]
                frc = (f"Ra={m['Ra']}" if c.startswith("C")
                       else f"dT={m['dT']:+.0f}")
                if c.startswith("C"):
                    lines.append(
                        f"| {c} | {frc} | {m['N_amp_MPa']:.3f} "
                        f"| {m['fw_N_amp_MPa']:.3f} "
                        f"| {m['rel_amp_err']:.2f} | - | - | - | - | - |")
                else:
                    lines.append(
                        f"| {c} | {frc} | {m['N_amp_MPa']:.3f} "
                        f"| {m['fw_N_amp_MPa']:.3f} "
                        f"| {m['rel_amp_err']:.2f} "
                        f"| {m['N_winter_MPa']:.3f} "
                        f"| {m['fw_N_winter_MPa']:.3f} "
                        f"| {m['N_summer_min_MPa']:.3f} "
                        f"| {m['fw_N_summer_min_MPa']:.3f} "
                        f"| {'yes' if m['summer_sign_agrees'] else 'NO'} |")
        ov_rows = [("OV_" + c, out["OV_" + c])
                   for c in ("E1", "E2", "E3", "E4", "E5")
                   if ("OV_" + c) in out]
        ov_diverged = any(m["rate_b_yr"] > 5.0 or m["imbalance"] > 1.0
                          for _, m in ov_rows)
        if ov_rows and not ov_diverged:
            lines += [
                "",
                "Valley leg — the FV oracle on a masked variable-geometry",
                "grid of the suite-E 'bench' valley (bed elevation + ice",
                "footprint mask + terminus-bed margin ghost), marched to",
                "steady state under the same E_INPUT.  The suite-E valley",
                "geometry previously rested on one implementation",
                "(VERDICT r4 item 4).  Anchored claims: the monotone",
                "overdeepening trend of trough-band N (both codes), and",
                "absolute agreement at the tens-of-percent level (masked",
                "structured FV vs 75 m unstructured FEM).",
                "",
                "| case | para | FV N_trough [MPa] | FEM N_trough [MPa] | "
                "rel err | FV N_mean [MPa] | FEM N_mean [MPa] | "
                "FV imbalance | FV rate_b [1/yr] |",
                "|---|---|---|---|---|---|---|---|---|",
            ]
            for c_name, m in ov_rows:
                c = c_name[3:]
                lines.append(
                    f"| {c} | {m['para']:+.2f} | {m['N_trough_MPa']:.3f} "
                    f"| {m['fw_N_trough_MPa']:.3f} "
                    f"| {m['rel_trough_err']:.2f} "
                    f"| {m['N_mean_MPa']:.3f} | {m['fw_N_mean_MPa']:.3f} "
                    f"| {m['imbalance']:.1e} | {m['rate_b_yr']:.2f} |")
            if "OV_trend" in out:
                t = out["OV_trend"]
                lines += [
                    "",
                    f"Overdeepening trend (trough N monotone E1 -> E5): "
                    f"oracle {'yes' if t['oracle_monotonic'] else 'NO'}, "
                    f"framework "
                    f"{'yes' if t['fw_monotonic'] else 'NO'}.",
                ]
            if "OV_cap" in out:
                cc = out["OV_cap"]
                lines += [
                    "",
                    f"VALLEY_B_CAP sensitivity (E5, cap 0.5 m vs 2.0 m, "
                    f"interior = ice column >= 50 m): relN "
                    f"{cc['relN_interior']:.1e} — the cap binds only in "
                    f"the thin terminus strip (capped-cell fraction "
                    f"{cc['frac_cap_05']:.3f} vs {cc['frac_cap_20']:.3f}); "
                    f"the certified interior state does not move.",
                ]
        elif ov_rows:
            # the valley FV leg DIVERGES from the framework — report the
            # negative result honestly instead of a fake validation table
            e1 = dict(ov_rows)["OV_E1"] if "OV_E1" in dict(ov_rows) else \
                ov_rows[0][1]
            st = out.get("OV_stationarity")
            lines += [
                "",
                "Valley leg — **negative result (disagreement found)**.",
                "The FV oracle's masked variable-geometry march does NOT",
                "reproduce the framework's valley states: from the SHMIP",
                "cold start (b0 = 1 cm, the framework's own init) the FV",
                "gap runs away to the VALLEY_B_CAP branch",
                f"(E1 at 48x12: capped-cell fraction "
                f"{e1['frac_cap']:.2f}, gap rate {e1['rate_b_yr']:.0f}/yr "
                f"after {e1['t_years']:.1f} yr, terminus discharge "
                f"{e1['Q_out']:.0f} vs source {e1['Q_src']:.1f} m^3/s),",
                "where the 75 m FEM transient converges to the mm-scale",
                "sheet (suite E table above).",
            ]
            if st is not None:
                lines += [
                    "The decisive check "
                    "(`scripts/valley_stationarity.py`): the framework's",
                    "converged E1 state interpolated onto the FV grid is",
                    "NOT stationary under the FV dynamics — trough gap",
                    f"{st['fem_b_trough_mm']:.1f} mm -> "
                    f"{st['fv_b_trough_mm_end']:.0f} mm in "
                    f"{st['years_marched']:.1f} yr (capped fraction "
                    f"{st['frac_cap_start']:.2f} -> "
                    f"{st['frac_cap_end']:.2f}).",
                ]
            lines += [
                "The FV capped branch fails its own global energy",
                "budget: routing Q_src through the valley's ~200 m head",
                "drop releases at most ~rho_w g Q dh / L ~ 0.04 m^3/s of",
                "dissipation melt, two orders below the discharge excess",
                "it reports — the runaway is an artifact of the FV leg's",
                "coarse masked grid (margin-strip head drops enter the",
                "cell-centered dissipation at half-cell resolution), not",
                "a physical branch.  Suites E/F therefore remain",
                "single-implementation validated (conservation + the",
                "certified frozen-field budget + monotone trend above);",
                "an oracle-grade valley cross-check needs a boundary-",
                "fitted independent discretization, recorded as open.",
            ]
    if "B5" in out:
        lines += [
            "",
            "## Suite B (moulins)",
            "",
            "n equal-rate moulins summing to the A5-equivalent 90 m^3/s, on the",
            "A1 distributed background (seeded-uniform positions — SHMIP's",
            "coordinate files are not redistributable; the metrics below are",
            "position-robust).  `relN(B, A5)` compares the y-averaged window",
            "N profile against the A5 distributed run: the many-moulins limit",
            "(B5) must approach the distributed case.",
            "",
            "| case | moulins | window mean N [MPa] | relN(B, A5) | "
            "Q_out [m^3/s] | Q_src [m^3/s] | imbalance |",
            "|---|---|---|---|---|---|---|",
        ]
        for c in ("B1", "B2", "B3", "B4", "B5"):
            lines.append(
                f"| {c} | {g(c, 'moulins')} | {g(c, 'winN_MPa'):.3f} "
                f"| {g(c, 'relN_vs_A5'):.3f} | {g(c, 'Q_out'):.3f} "
                f"| {g(c, 'Q_src'):.3f} | {g(c, 'imbalance'):.1e} |")
    if "C4" in out:
        lines += [
            "",
            "## Suite C (diurnal forcing)",
            "",
            "B5 moulin input modulated inputs(t) = inputs max(0, 1 + Ra",
            "sin(2 pi t/day)), continued from the spun-up B5 state; the",
            "window-mean-N oscillation over the final two cycles must grow",
            "monotonically with the forcing amplitude Ra.  (The diurnal",
            "forcing rectifies the nonlinear system toward low mean N — the",
            "SHMIP-documented strong diurnal response — so amplitudes are",
            "reported absolute, not mean-relative.)",
            "",
            "| case | Ra | cycle-mean N [MPa] | N amplitude [MPa] |",
            "|---|---|---|---|",
        ]
        for c in ("C1", "C2", "C3", "C4"):
            lines.append(f"| {c} | {g(c, 'Ra')} "
                         f"| {g(c, 'N_mean_cycle') / 1e6:.3f} "
                         f"| {g(c, 'N_amp_MPa'):.3f} |")
        lines.append("")
        lines.append("Amplitude monotonic in Ra: "
                     f"**{out['C_amplitude_monotonic']}**.")
    if "D5" in out:
        lines += [
            "",
            "## Suite D (seasonal degree-day forcing)",
            "",
            "A1 background + the SHMIP degree-day runoff model (sea-level",
            "temperature -5 - 16 cos(2 pi t/yr) + dT degC, lapse 0.0075 K/m,",
            "DDF 0.01 m/(K day)) on the suite-A topography, spun up "
            f"{out['D3']['spin_years']} years then sampled over the final",
            "year at 10-day cadence.  Warmer offsets must deepen the summer",
            "N minimum and widen the seasonal swing; the winter maximum",
            "must return to the (A1-like) background branch.",
            "",
            "| case | dT [K] | winter max N [MPa] | summer min N [MPa] | "
            "N amplitude [MPa] | imbalance (winter) |",
            "|---|---|---|---|---|---|",
        ]
        for c in ("D1", "D2", "D3", "D4", "D5"):
            lines.append(
                f"| {c} | {g(c, 'dT'):+.0f} | {g(c, 'N_winter_MPa'):.3f} "
                f"| {g(c, 'N_summer_min_MPa'):.3f} "
                f"| {g(c, 'N_amp_MPa'):.3f} | {g(c, 'imbalance'):.1e} |")
        lines.append("")
        lines.append("Amplitude monotonic in dT: "
                     f"**{out['D_amplitude_monotonic']}**.")
    if "artesian_D5" in out:
        a = out["artesian_D5"]
        xw = a["x_neg_km_at_worst"]
        lines += [
            "",
            "### Artesian regime (N < 0)",
            "",
            "The warm seasonal cases drive summer water pressure above",
            "overburden — window-mean N down to "
            f"{out['D5']['N_summer_min_MPa']:.2f} MPa on D5.  This is",
            "intended SHAKTI physics, not blowup: the closure is SIGNED",
            "(N |N|^{n-1}, reference constitutive.py:29-31), so under",
            "N < 0 creep OPENS the gap — a negative feedback that drains",
            "the over-pressurized sheet (tests/test_constitutive.py pins",
            "the sign; the FV oracle's march implements the same signed law",
            "independently and reproduces the excursion, suite OT).",
            "Policy: ALLOW + FLAG — no artificial N floor (the reference",
            "has none), with a per-save N_min column in every production",
            "run log (api/run.py log.csv).  Where/when on D5 (final",
            "forced year, 10-day samples):",
            "",
            f"- any-node N < 0 on {a['days_any_neg']} days of the year;"
            f" window-MEAN N < 0 on {a['days_winmean_neg']} days;",
            f"- worst excursion day {a['worst_day']}: N_min"
            f" {a['N_min_MPa']:.2f} MPa"
            f" = {-a['min_over_pi']:.2f} x local overburden, negative"
            f" fraction up to {a['frac_neg_max']:.0%} of nodes,"
            + (f" spanning x in [{xw[0]:.0f}, {xw[1]:.0f}] km"
               if xw else "") + ";",
            f"- FV oracle under the same forcing (suite OT D5): summer"
            f" window-mean minimum sign agrees; its worst cell reaches"
            + (f" {out['OT_D5']['N_cellmin_MPa']:.2f} MPa."
               if "OT_D5" in out else " (run suite T)."),
        ]
    if "E5" in out:
        lines += [
            "",
            "## Suite E (valley glacier, overdeepening ladder)",
            "",
            "The 6 km SHMIP 'bench' valley at 75 m resolution "
            f"({out['E1']['n_nodes']} nodes), steady input "
            f"{shmip.E_INPUT:.3g} m/s, hourly steps to steady state",
            "(steadiness = rel change of N over the final 30 days).  The",
            "footprint is para-independent by construction; para < 0.05",
            "carves a mid-glacier overdeepening (trough band x in",
            "[2, 4] km).  Measured trend: mean and trough N increase",
            "MONOTONICALLY with overdeepening depth (the adverse exit",
            "slope reduces the dissipation-opening term, the sheet",
            "closes, and effective pressure rises) — the sheet-model",
            "analogue of the channel shutdown SHMIP reports over",
            "overdeepenings (de Fleurian et al. 2018 §5.4).",
            "",
            "Valley regularization: SHMIP's p_w = 0 terminus BC leaves",
            "N ~ 9 kPa at the ~1 m snout, so creep closure never balances",
            "SHAKTI's dissipation opening and the sheet gap grows without",
            "bound (capped only at the ice column it reaches 45-210 m and",
            "E4/E5/F diverge in the year-2 winter reorganization).  All",
            "valley cases cap the gap at min(ice column, 0.5 m) — the",
            "sheet approximation is not meaningful beyond decimeter gaps",
            "(setups/setup_shmip.py VALLEY_B_CAP); with it every E and F",
            "case integrates stably through multi-year seasonal cycles.",
            "Budgets below use the certified frozen-field identity",
            "(solve/diagnostics.certified_budget): the transient leaves N",
            "converged against the pre-update gap field, and the capped",
            "terminus rows amplify that per-step flicker into O(100 m^3/s)",
            "of reaction junk if evaluated naively.",
            "",
            "| case | para | mean N [MPa] | trough N [MPa] | "
            "trough b [mm] | steady rel | Q_out [m^3/s] | imbalance |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for c in ("E1", "E2", "E3", "E4", "E5"):
            lines.append(
                f"| {c} | {g(c, 'para'):+.2f} | {g(c, 'N_mean_MPa'):.3f} "
                f"| {g(c, 'N_trough_MPa'):.3f} | {g(c, 'b_trough_mm'):.2f} "
                f"| {g(c, 'steady_rel_30d'):.1e} | {g(c, 'Q_out'):.3f} "
                f"| {g(c, 'imbalance'):.1e} |")
    if "F5" in out:
        lines += [
            "",
            "## Suite F (seasonal forcing on the E1 valley)",
            "",
            "The suite-D degree-day model on the E1 valley geometry (A1",
            "basal background), hourly steps, final-year glacier-mean N",
            "sampled at 10-day cadence.",
            "",
            "| case | dT [K] | winter max N [MPa] | summer min N [MPa] | "
            "N amplitude [MPa] |",
            "|---|---|---|---|---|",
        ]
        for c in ("F1", "F2", "F3", "F4", "F5"):
            lines.append(
                f"| {c} | {g(c, 'dT'):+.0f} | {g(c, 'N_winter_MPa'):.3f} "
                f"| {g(c, 'N_summer_min_MPa'):.3f} "
                f"| {g(c, 'N_amp_MPa'):.3f} |")
        lines.append("")
        lines.append("Amplitude monotonic in dT: "
                     f"**{out['F_amplitude_monotonic']}**.")
        lines += [
            "(The warm branch F3-F5 grows monotonically; the cold-end",
            "amplitudes F1-F3 are flat within ~3% — the bench valley's",
            "terminus sits at sea level, so a melt season survives even",
            "dT = -4 K and the seasonal swing saturates instead of",
            "shrinking.  Suite D on the 100 km suite-A topography, where",
            "elevation kills the cold-end melt season, shows the strict",
            "monotone response.)",
        ]
    if "A1" in out:
        lines += [
            "",
            "## Reading (suite A)",
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
        ]
    lines += [
        "",
        "Published SHMIP tuning note: de Fleurian et al. (2018) report",
        "per-model mean-N profiles that differ across the 13 participating",
        "models by factors of several; without the distribution files the",
        "oracle above (same physics, independent discretization) is the",
        "sharper check.  Suite D/F forcing and the suite-E valley geometry",
        "are implemented from the published description (constants in",
        "setups/setup_shmip.py); the conservation and monotone-response",
        "checks used are robust to the remaining free choices.  This",
        "artifact is regenerated per suite by",
        "`python scripts/shmip_validate.py --suites ABCDEFSO`.",
    ]
    return lines


def main(quick=False, suites="ABCDEF", force=False, cases=None,
         budget_override=None):
    out = _Cache()
    if os.path.exists(CACHE):
        out.update(json.load(open(CACHE)))
        out._dirty.clear()
    A5 = B5_state = None
    if "A" in suites:
        A5 = suite_A(out, quick)
    if "B" in suites:
        if A5 is None:
            raise SystemExit("suite B needs suite A in the same invocation "
                             "(A5 state); use --suites AB...")
        B5_state = suite_B(out, quick, A5)
    if "C" in suites:
        if B5_state is None:
            raise SystemExit("suite C needs suite B in the same invocation "
                             "(B5 state); use --suites ABC...")
        suite_C(out, quick, B5_state)
    if "D" in suites:
        suite_D(out, quick)
    if "E" in suites:
        suite_E(out, quick)
    if "F" in suites:
        suite_F(out, quick)
    if "S" in suites:
        suite_S(out, quick, force=force, cases=cases,
                budget_override=budget_override)
    if "O" in suites:
        suite_O(out, quick, force=force)
    if "T" in suites:
        # transient oracle legs (needs suites C/D framework rows cached)
        suite_OT(out, quick, force=force, cases=cases)
    if "V" in suites:
        # valley oracle leg (needs suite E framework rows cached)
        suite_OV(out, quick, force=force)
    if "X" in suites:
        # artesian-regime study (needs suite D rows for context)
        suite_artesian(out, quick, force=force)
    # persist the (hours-of-compute) results cache (merge-by-dirty-keys;
    # concurrent invocations covering other cases are not clobbered)
    _save_cache(out)
    print("wrote SHMIP.md + scripts/shmip_results.json")


if __name__ == "__main__":
    quick = "--quick" in sys.argv
    force = "--force" in sys.argv
    suites = "ABCDEF"
    cases = budget_override = None
    for i, a in enumerate(sys.argv):
        if a == "--suites":
            suites = sys.argv[i + 1]
        elif a.startswith("--suites="):
            suites = a.split("=", 1)[1]
        elif a == "--cases":
            cases = tuple(sys.argv[i + 1].split(","))
        elif a.startswith("--cases="):
            cases = tuple(a.split("=", 1)[1].split(","))
        elif a == "--budget":
            budget_override = tuple(
                float(x) for x in sys.argv[i + 1].split(","))
        elif a.startswith("--budget="):
            budget_override = tuple(
                float(x) for x in a.split("=", 1)[1].split(","))
    if budget_override is not None:
        budget_override = (int(budget_override[0]), int(budget_override[1]),
                           float(budget_override[2]))
    main(quick=quick, suites=suites, force=force, cases=cases,
         budget_override=budget_override)

"""User-level steady-state driver: ``solve_steady(md)``.

The direct counterpart to the "spin up for N years and hope" workflow the
reference imposes (its only time axis is md.timesteps): freezes the model,
marches the pseudo-transient continuation (solve/steady.py) to the
requested drift tolerance in ONE device program, and returns the steady
state in the caller's node order with a conservation certificate.

Typical use (SHMIP-style steady cases, initial conditions for transients,
far-field equilibrium checks)::

    md = setups.setup_shmip.initialize("A3", ...)
    out = solve_steady(md, tol=1e-3)          # < 0.1% drift per year
    N_steady = out["N"]; b_steady = out["b"]

The transient machinery is untouched: trajectories of ``md.solve()`` stay
bit-identical (the semi-implicit gap update exists only on this path).
"""

from __future__ import annotations

import time

import jax
import numpy as np

from shakti_tpu.solve.steady import (YEAR, cycle_certify, make_steady_step,
                                     steady_carry_init,
                                     steady_info_from_carry, steady_solve)


def _ptc_segmented(md, step, state0, mask, mesh, ck_dir, segment_steps, kw):
    """PTC march in checkpointed segments (see solve_steady docstring).

    One compiled program serves every segment: the pause index ``k_end``
    rides in the carry, so re-entry costs no recompilation.  The carry is
    persisted by flattening its pytree (np.savez round-trips every leaf's
    dtype and bits exactly; the segmented march is therefore bit-identical
    to the single-shot while loop, which it literally re-enters)."""
    import os

    import jax.numpy as jnp

    from shakti_tpu.io.checkpoint import mesh_fingerprint

    os.makedirs(ck_dir, exist_ok=True)
    path = os.path.join(ck_dir, "ptc.npz")
    fp = mesh_fingerprint(md.nodes)
    kw2 = dict(kw)
    max_steps = kw2.pop("max_steps")
    seg = max(int(segment_steps), 1)
    carry = steady_carry_init(state0, dt0=kw2.pop("dt0"),
                              max_steps=max_steps)
    flat, treedef = jax.tree_util.tree_flatten(carry)
    if os.path.exists(path):
        ck = np.load(path)
        if int(ck["mesh_crc"]) != fp:
            raise ValueError(f"{path}: checkpoint belongs to a different "
                             "mesh (fingerprint mismatch)")
        leaves = [np.asarray(ck[f"leaf_{i}"]) for i in range(len(flat))]
        carry = jax.tree_util.tree_unflatten(treedef, [
            jnp.asarray(a, np.asarray(b).dtype)
            for a, b in zip(leaves, flat)])

    runner = jax.jit(lambda c: steady_solve(
        step, state0, params=md.params, drift_mask=mask, mesh=mesh,
        dt0=1.0, max_steps=max_steps, carry_in=c, return_carry=True,
        **kw2))
    while not bool(np.asarray(carry["done"])) \
            and int(np.asarray(carry["k"])) < max_steps:
        carry = dict(carry)
        carry["k_end"] = jnp.asarray(
            min(int(np.asarray(carry["k"])) + seg, max_steps), jnp.int32)
        state, dinfo, carry = runner(carry)
        lv = jax.tree_util.tree_flatten(carry)[0]
        np.savez(path + ".tmp.npz", mesh_crc=np.uint32(fp),
                 **{f"leaf_{i}": np.asarray(v) for i, v in enumerate(lv)})
        os.replace(path + ".tmp.npz", path)
    return carry["state"], steady_info_from_carry(carry)


def solve_steady(md, *, tol=1e-2, t_ref=YEAR, dt0=None, dt_max=1e9,
                 max_steps=2000, max_rel_change=0.5, stab_safety=2.0,
                 budget=True, strict=True, cycle_window=0,
                 polish=False, polish_max_newton=3000,
                 polish_patience=3, polish_max_wall_s=float("inf"),
                 checkpoint=None, segment_steps=256):
    """Solve the model to steady state (drift < ``tol`` per ``t_ref``).

    Returns a dict: steady nodal fields ``N``/``b``/``qx``/``qy`` (caller
    node order), the raw solver-order ``state``, ``info`` (host scalars:
    converged/steps/accepted/rejected/rate_N/rate_b/rate_b_bdry/kappa/dt/
    t_pseudo/newton_total/cg_total/wall_s — drift rates cover non-Dirichlet
    nodes; ``rate_b_bdry`` is the N-pinned boundary nodes' residual gap
    drift, unbounded-equilibrium margins included honestly rather than in
    the certificate), and — when ``budget`` — the global
    conservation certificate ``Q_out``/``Q_src`` (boundary discharge vs
    interior production, solve/diagnostics.py; the two agree at a true
    steady state).

    Raises ``ConvergenceError`` when ``max_steps`` PTC attempts did not
    reach ``tol`` (the partial state rides on the exception for triage).
    ``strict=False`` returns the plateau state with
    ``info["converged"] = False`` instead — for regimes with genuinely
    persistent dynamics (high-melt SHMIP cases keep channelization
    activity at ~0.3-3/yr drift; the transient route shows the same
    physics), where the plateau state and its mass budget are still the
    meaningful scientific output.

    ``cycle_window > 0`` upgrades such plateaus to a CONCLUSIVE verdict:
    an unconverged solve continues into ``solve/steady.cycle_certify``
    (two windows of ``cycle_window`` accepted steps; the orbit centroid
    must stop moving to ``tol`` per ``t_ref``).  On certification the
    returned N/b/qx/qy are the CYCLE-MEAN fields, ``info["verdict"]`` is
    ``"cycle"``, ``info["cycle_amp_N"]``/``["cycle_amp_b"]`` report the
    relative RMS cycle amplitude, and no error is raised even under
    ``strict`` — a certified cycle is a conclusive answer.  Otherwise
    ``info["verdict"]`` is ``"steady"`` (drift certificate fired) or
    ``"no"`` (nothing certified; strict still raises).  The mass budget
    of a cycle verdict is evaluated on the cycle-mean state.

    ``polish=True`` (single-device only; ignored on the distributed
    path) hands the PTC state to the monolithic coupled Newton
    (solve/monolithic.py), which solves the transient's own fixed-point
    equations directly — the conclusive tool for channelized regimes
    where the staggered PTC plateaus: measured SHMIP A3, plateau
    0.39/yr -> certified 3e-4/yr.  On success ``verdict`` is
    ``"polished"``, the returned fields are the equation-level
    equilibrium, and ``info["rate"]`` becomes the equation-level drift
    rate (``polish_*`` keys carry the solver stats).  On failure the
    cycle/plateau logic proceeds unchanged.  ``polish_max_newton`` /
    ``polish_patience`` / ``polish_max_wall_s`` bound the segmented
    march (total Newton iterations; consecutive non-improving segments —
    wandering channelized attractors need ~25+ before exiting to a true
    fixed point, measured on SHMIP A3; host wall seconds).  When no
    fixed point is reached but the march sampled enough pseudo-time,
    the ``"stationary"`` verdict certifies the attractor instead (the
    returned fields are then the pseudo-time-weighted TIME MEAN, with
    ``wander_rate``/``wander_amp_*`` in ``info``).

    ``checkpoint``: a DIRECTORY for crash insurance on hours-long solves
    (single-device path; SHMIP suite-S A4 cost 5,073 s single-shot).
    The PTC march then runs in segments of ``segment_steps`` attempts,
    persisting its full loop carry to ``<dir>/ptc.npz`` after each
    segment (the carry round-trips bit-exactly, so a killed-and-resumed
    march replays the uninterrupted iterate sequence and lands on the
    identical verdict); the polish march checkpoints each Newton
    segment to ``<dir>/polish.npz`` (solve/monolithic.steady_polish).
    Re-invoking with the same directory resumes; both files are removed
    on successful completion.  The cycle-certificate stage is one
    bounded device program and is not checkpointed.
    """
    md.validate(require_timesteps=False)
    if dt0 is None:
        dt0 = 3600.0
        if md.timesteps is not None and np.size(md.timesteps) >= 2:
            ts = np.asarray(md.timesteps, dtype=np.float64)
            dt0 = float(np.abs(np.diff(ts)).mean())
    kw = dict(dt0=dt0, dt_max=dt_max, tol=tol, t_ref=t_ref,
              max_steps=max_steps, max_rel_change=max_rel_change,
              stab_safety=stab_safety)

    dist = getattr(md, "distributed", False)
    if dist:
        # node-sharded halo path: the same PTC while-loop under shard_map
        # (psum'd norms keep every decision shard-consistent)
        from shakti_tpu.parallel.dist import (gather_state,
                                              make_distributed_steady_runner)
        runner, st0, plan = make_distributed_steady_runner(
            md, cycle_window=cycle_window, **kw)
        t0 = time.time()
        state_stacked, dinfo = runner(st0)
        state = gather_state(plan, state_stacked)
    else:
        mesh, static, state0, cfg = md.freeze()
        if state0.lag_op is not None:
            import dataclasses
            state0 = dataclasses.replace(state0, lag_op=None)
        step, cfg = make_steady_step(mesh, static, md.params, cfg)
        # Dirichlet nodes are excluded from the drift certificate: where
        # the pinned N is near zero (the SHMIP margin) the gap has no
        # reachable equilibrium — see the solve/steady.py module docstring;
        # their residual drift is reported as info["rate_b_bdry"]
        mask = ~static.dirichlet
        t0 = time.time()
        if checkpoint:
            state, dinfo = _ptc_segmented(md, step, state0, mask, mesh,
                                          checkpoint, segment_steps, kw)
        else:
            runner = jax.jit(lambda s: steady_solve(
                step, s, params=md.params, drift_mask=mask, mesh=mesh,
                **kw))
            state, dinfo = runner(state0)
    info = {k: (float(v) if np.asarray(v).dtype.kind == "f" else int(v))
            for k, v in dinfo.items()}
    info["converged"] = bool(dinfo["converged"])

    polished = False
    stationary = False
    if polish and not dist:
        # monolithic coupled Newton (solve/monolithic.py): solve the
        # TRANSIENT'S OWN fixed-point equations directly from the PTC
        # state (plateau or certified), with pseudo-transient-damped
        # globalization.  Where the staggered PTC plateaus (channelized
        # SHMIP regimes: the staggered b<->N instability pins its dt ~1e3 s
        # while the slow modes relax over years), the implicit coupling
        # lets dtau grow to ~1e9 s and certifies the equilibrium from the
        # equations — measured A3: 0.39/yr plateau -> 3e-4/yr certified.
        from shakti_tpu.solve.monolithic import steady_polish
        import dataclasses as _dc
        st_in = state
        if st_in.lag_op is not None:
            st_in = _dc.replace(st_in, lag_op=None)
        import os as _os
        p_state, pinfo = steady_polish(
            mesh, static, md.params, st_in, tol=tol, t_ref=t_ref,
            armijo_cuts=13, max_newton_total=polish_max_newton,
            patience=polish_patience, max_wall_s=polish_max_wall_s,
            checkpoint=(_os.path.join(checkpoint, "polish.npz")
                        if checkpoint else None))
        info["polish_rate_b"] = float(np.asarray(pinfo["rate_b"]))
        info["polish_resN"] = float(np.asarray(pinfo["resN_rel"]))
        info["polish_newton"] = int(pinfo["newton"])
        info["polish_converged"] = bool(np.asarray(pinfo["converged"]))
        if info["polish_converged"]:
            polished = True
            state = p_state
            info["converged"] = True
            info["rate"] = info["polish_rate_b"]
        elif "wander_rate" in pinfo:
            # no reachable fixed point, but the implicit march sampled
            # enough pseudo-years to judge the ATTRACTOR: if its centroid
            # is stationary to tol, the regime is certified STATISTICALLY
            # STATIONARY and the time-mean state is the output (the same
            # semantics as the cycle certificate, on the implicit
            # pseudo-time axis where channel rearrangements actually
            # resolve — the transient-step cycle windows cannot span
            # the years these dynamics need)
            info["wander_rate"] = float(pinfo["wander_rate"])
            info["wander_amp_b"] = float(pinfo["wander_amp_b"])
            info["wander_amp_N"] = float(pinfo["wander_amp_N"])
            info["t_march_yr"] = float(pinfo["t_march"]) / YEAR
            if info["wander_rate"] < tol:
                stationary = True
                state = pinfo["mean_state"]

    certified_cycle = False
    if not info["converged"] and not stationary and cycle_window:
        # limit-cycle certificate (solve/steady.cycle_certify): a plateau
        # regime gets a conclusive verdict — the orbit centroid must stop
        # moving — and the CYCLE-MEAN state becomes the output
        dt_f = dinfo["dt"]
        if dist:
            mean_stacked, cinfo = plan["cycle_run"](state_stacked, dt_f)
            mean_state = gather_state(plan, mean_stacked)
        else:
            cyc_runner = jax.jit(lambda s, dtv: cycle_certify(
                step, s, params=md.params, dt=dtv, tol=tol, t_ref=t_ref,
                window=cycle_window, max_rel_change=max_rel_change,
                drift_mask=mask, mesh=mesh))
            mean_state, cinfo = cyc_runner(state, dt_f)
        certified_cycle = bool(cinfo["certified"])
        info["cycle_rate"] = float(cinfo["cycle_rate"])
        info["cycle_amp_N"] = float(cinfo["amp_N"])
        info["cycle_amp_b"] = float(cinfo["amp_b"])
        info["cycle_steps"] = int(cinfo["steps"])
        info["cycle_window"] = int(cycle_window)
        info["newton_total"] += int(cinfo["newton_total"])
        info["cg_total"] += int(cinfo["cg_total"])
        if certified_cycle:
            state = mean_state
    info["verdict"] = ("polished" if polished
                       else "steady" if info["converged"]
                       else "stationary" if stationary
                       else "cycle" if certified_cycle else "no")
    info["wall_s"] = round(time.time() - t0, 3)

    if info["verdict"] == "no" and strict:
        from shakti_tpu.api.run import ConvergenceError
        cyc_note = (f", cycle rate {info['cycle_rate']:.3e}"
                    if "cycle_rate" in info else "")
        err = ConvergenceError(
            f"steady solve did not reach tol={tol:g} per {t_ref:g} s in "
            f"{max_steps} PTC steps (final drift rate "
            f"{info['rate']:.3e}, {info['rejected']} rejected{cyc_note}); "
            "loosen tol, raise max_steps, lower stab_safety, or raise "
            "cycle_window")
        err.state, err.info = state, info
        raise err

    if checkpoint and info["verdict"] != "no":
        # conclusive return: drop the PTC crash-insurance file (a "no"
        # verdict — strict raise or honest plateau return — keeps it, so
        # a rerun with a larger max_steps budget resumes the exhausted
        # march instead of restarting it)
        import os as _os
        _p = _os.path.join(checkpoint, "ptc.npz")
        if _os.path.exists(_p):
            _os.remove(_p)

    out = {"state": state, "info": info}
    unp = md.node_iperm if md.node_iperm is not None else slice(None)
    out["N"] = np.asarray(state.N)[unp]
    out["b"] = np.asarray(state.b)[unp]
    q = np.asarray(state.q)
    out["qx"], out["qy"] = q[unp, 0], q[unp, 1]
    if budget:
        from shakti_tpu.solve import diagnostics as diag
        if getattr(md, "distributed", False):
            # the budget reductions run single-device on the gathered state
            mesh, static, _, cfg = md.freeze()
        out["Q_out"] = diag.boundary_discharge(mesh, static, state,
                                               md.params, cfg.quad_degree)
        out["Q_src"] = diag.water_production(mesh, static, state, md.params,
                                             cfg.quad_degree)
    return out

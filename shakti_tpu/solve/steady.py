"""Direct steady-state solver: pseudo-transient continuation (PTC).

The reference has no steady-state capability — equilibria are found by
marching the transient for years of hourly steps (reference
notebooks/example.ipynb; the SHMIP tuning runs in scripts/shmip_validate.py
do the same).  This module finds them directly, reusing the fused timestep
as the PTC iteration:

  * the gap evolution runs SEMI-IMPLICITLY (``make_step_fn(...,
    b_update="semi_implicit")``): the creep-closure term — linear in b —
    is treated backward-Euler, so the closure decay mode is
    unconditionally stable and the pseudo-timestep is not bound by the
    closure timescale (A N^3 ~ hours at channel pressures);
  * dt adapts by switched-evolution relaxation (SER): dt grows as the
    steady-state residual falls (dt_{k+1} = dt_k * rate_{k-1}/rate_k,
    clipped), shrinks on rejected steps;
  * remaining explicit physics bounds dt: the melt-opening feedback
    (m ~ b^3 at fixed head gradient => d(db/dt)/db ~ +2 m/(rho_i b),
    the channelization instability) is only stabilized through the
    N-solve's head response, so dt is additionally capped at
    ``stab_safety / max(3 m / (rho_i b))`` each step;
  * a step is rejected (state reverted, dt shrunk) when its Newton solve
    fails, produces non-finite values, or moves b by more than
    ``max_rel_change`` in relative L2 — the oscillation guard for dt
    beyond the coupled stability limit;
  * convergence is certified in-graph: the relative state drift per
    reference time, rate = max(||dN||/||N||, ||db||/||b||) * t_ref/dt,
    must fall below ``tol`` on an accepted step.  With t_ref = 1 year and
    tol = 1e-3 the accepted state moves less than 0.1% per year — the
    same "has it stopped changing" judgement the reference user makes by
    eyeballing year-over-year transients, made quantitative.

The whole driver is one ``lax.while_loop`` under jit: a steady solve is a
single device program, like a transient window.  Works on the
single-device mesh path; the node-sharded halo path supplies its psum'd
norms through ``mesh`` (reductions and the dt cap are then globally
consistent across shards).

Why the dt cap is GLOBAL (measured on the slab case, 30x30, f64): the
pseudo-dt is bound by the fastest dissipation-active node (the
channelization feedback near moulins/channels), while the slow tail is
far-field closure relaxation with a ~1000x longer timescale — the obvious
accelerations do NOT survive contact with the coupled system:

  * uncapped SER dt -> sustained limit cycle (rate stalls ~1/yr; the
    frozen-N melt feedback amplification (1+3c dt)/(1+c dt) -> 3 at large
    dt and the N-response no longer damps it);
  * per-node local time stepping (each node at its own stability bound,
    the gap update being a nodal ODE) -> collective oscillation: every
    dissipation-active node then sits at amplification ~1.8 and they
    couple through the N-solve (rate stalls ~2-5/yr);
  * a two-tier split (uniform cap on dissipation-active nodes, local
    equilibrium jumps in the far field) -> the large far-field jumps push
    the state out of the N-solve's Newton basin (unrecoverable rejection);
  * Aitken extrapolation of the outer fixed point -> consecutive diffs
    only ~0.77-correlated (the slow "mode" rotates), ~3% net gain.

The capped march converges monotonically; with the default tol (1e-2/yr
drift) it needs a few hundred pseudo-steps of ~2 Newton iterations each —
on the slab case that is ~200x fewer steps than hourly transient marching
to the same drift (the reference's only route).  ``dt_b`` per-node
stepping support remains in solve/timestep.py for future work; this
driver intentionally does not use it.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

YEAR = 3.1536e7     # 365-day year [s], the default rate-reference time


def steady_solve(step_fn, state0, *, dt0=3600.0, dt_max=1e9, tol=1e-2,
                 t_ref=YEAR, max_steps=2000, growth_cap=4.0, shrink=0.25,
                 max_rel_change=0.5, stab_safety=2.0, rho_i=917.0,
                 mesh=None):
    """March ``step_fn`` to steady state with adaptive pseudo-timesteps.

    ``step_fn`` should be built with ``b_update="semi_implicit"`` (an
    explicit-closure step caps useful dt at the closure timescale) and
    WITHOUT the dt-halving wrapper (``adaptive_dt_levels=0`` — rejection
    handles failed steps here).  ``state0.lag_op`` must be None
    (``lag_operator=False``): rejected steps would revert the carry.

    Returns ``(state, info)`` with info scalars still on device:
    ``converged`` (rate < tol on an accepted step), ``steps`` (total
    attempts), ``accepted``, ``rejected``, ``rate`` / ``rate_N`` /
    ``rate_b`` (final drift per t_ref), ``dt`` (final pseudo-timestep),
    ``t_pseudo`` (accumulated pseudo-time), ``newton_total`` /
    ``cg_total``.
    """
    if state0.lag_op is not None:
        raise ValueError("steady_solve requires lag_operator=False "
                         "(State.lag_op must be None)")
    sharded = mesh is not None and mesh.halo is not None
    norm = mesh.halo.norm if sharded else jnp.linalg.norm
    pamax = ((lambda x: jax.lax.pmax(x, mesh.halo.axis)) if sharded
             else (lambda x: x))
    pall = ((lambda x: jax.lax.pmin(x.astype(jnp.int32),
                                    mesh.halo.axis) > 0) if sharded
            else (lambda x: x))
    dtype = state0.N.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    f = lambda v: jnp.asarray(v, dtype)
    i32 = lambda v: jnp.asarray(v, jnp.int32)

    def rates(old, new, dt):
        rN = norm(new.N - old.N) / jnp.maximum(norm(old.N), tiny)
        rb = norm(new.b - old.b) / jnp.maximum(norm(old.b), tiny)
        per_ref = f(t_ref) / dt
        return rN * per_ref, rb * per_ref, rb

    def dt_cap(state):
        """Stability bound from the explicit melt-opening feedback:
        the frozen-N gap ODE grows like +3 m/(rho_i b) where melt opens
        (see module docstring); only the N-coupling damps it, so cap
        dt at stab_safety over the fastest such rate."""
        lam = 3.0 * jnp.maximum(state.melt, 0.0) / (rho_i * jnp.maximum(
            state.b, tiny))
        if sharded:
            # ghost/dead slots must not bind the GLOBAL pseudo-dt: each
            # node contributes through its owning shard exactly once
            lam = lam * mesh.halo.owned_mask
        return f(stab_safety) / jnp.maximum(pamax(jnp.max(lam)), tiny)

    def cond(c):
        return (~c["done"]) & (c["k"] < max_steps)

    def body(c):
        state, dt = c["state"], c["dt"]
        new_state, d = step_fn(state, dt)
        finite = pall(jnp.all(jnp.isfinite(new_state.N))
                      & jnp.all(jnp.isfinite(new_state.b)))
        rate_N, rate_b, rel_b = rates(state, new_state, dt)
        accept = d["converged"] & finite & (rel_b <= max_rel_change)
        rate = jnp.maximum(rate_N, rate_b)
        sel = lambda a, b: jnp.where(accept, a, b)
        out_state = jax.tree_util.tree_map(sel, new_state, state)
        done = accept & (rate < tol)
        # SER: grow dt as the drift rate falls, shrink when it rises;
        # hard-shrink on rejection; always respect the stability cap
        ser = jnp.clip(c["rate"] / jnp.maximum(rate, tiny),
                       f(shrink), f(growth_cap))
        dt_acc = jnp.minimum(jnp.minimum(dt * ser, f(dt_max)),
                             dt_cap(out_state))
        dt_new = jnp.where(accept, dt_acc, jnp.maximum(dt * f(shrink),
                                                       f(1e-6) * f(dt0)))
        return {
            "state": out_state,
            "dt": dt_new,
            "rate": jnp.where(accept, rate, c["rate"]),
            "rate_N": jnp.where(accept, rate_N, c["rate_N"]),
            "rate_b": jnp.where(accept, rate_b, c["rate_b"]),
            "t_pseudo": c["t_pseudo"] + jnp.where(accept, dt, f(0.0)),
            "k": c["k"] + 1,
            "accepted": c["accepted"] + accept.astype(jnp.int32),
            "rejected": c["rejected"] + (~accept).astype(jnp.int32),
            "newton_total": c["newton_total"] + d["newton_iters"],
            "cg_total": c["cg_total"] + d["cg_iters"],
            "done": done,
        }

    init = {
        "state": state0, "dt": f(dt0),
        "rate": f(jnp.inf), "rate_N": f(jnp.inf), "rate_b": f(jnp.inf),
        "t_pseudo": f(0.0), "k": i32(0),
        "accepted": i32(0), "rejected": i32(0),
        "newton_total": i32(0), "cg_total": i32(0),
        "done": jnp.asarray(False),
    }
    out = jax.lax.while_loop(cond, body, init)
    info = {k: out[k] for k in ("done", "k", "accepted", "rejected", "rate",
                                "rate_N", "rate_b", "dt", "t_pseudo",
                                "newton_total", "cg_total")}
    info["converged"] = info.pop("done")
    info["steps"] = info.pop("k")
    return out["state"], info


def make_steady_step(mesh, static, params, cfg):
    """The PTC iteration: the fused timestep with the semi-implicit gap
    update, no dt-halving wrapper, no operator carry, and no guess
    extrapolation (2N - N_prev assumes uniform dt; under SER's
    order-of-magnitude dt swings the previous solution is the better
    Newton start, as in the reference, solvers.py:48)."""
    from shakti_tpu.solve.timestep import make_step_fn
    cfg = dataclasses.replace(cfg, adaptive_dt_levels=0, lag_operator=False,
                              extrapolate_guess=False)
    return make_step_fn(mesh, static, params, cfg,
                        b_update="semi_implicit"), cfg

"""Transient driver + results IO: the `solvers.solve(md)` equivalent.

Reproduces the reference's run protocol (reference solvers.py:57-238):

  * results directory must not pre-exist (solvers.py:91-102) — unless resuming;
  * writes t.npy, nodes_x.npy, nodes_y.npy up front (solvers.py:119-121);
  * copies the setup file into the results dir for provenance (:123-125);
  * saves nodal N/b/qx/qy history rows after step i whenever
    i % nt_save == 0 (:199-215), with rolling checkpoint writes of the
    accumulated arrays every nt_check steps (:217-223) and a final write
    (:231-236);
  * aborts on Newton non-convergence (the reference's `assert converged`,
    :179-180) — here raised host-side from the in-graph flag.

TPU-shaped differences: steps run in `lax.scan` windows that end exactly at
save events (1 device launch per save interval instead of per-step host
chatter), per-step solver diagnostics are recorded to log.csv, and a real
resume checkpoint is written alongside (shakti_tpu.io.checkpoint — the
reference cannot resume, SURVEY §5).
"""

from __future__ import annotations

import os
import shutil
import time

import jax
import numpy as np

from shakti_tpu.io import checkpoint as ckpt
from shakti_tpu.solve.timestep import (make_forcing, make_step_fn,
                                       run_window)


class ConvergenceError(RuntimeError):
    pass


def _save_windows(nt: int, nt_save: int, start: int):
    """Yield (start, length, save_after) covering steps [start, nt) with
    windows ending at save events (i % nt_save == 0 saves AFTER step i)."""
    i = start
    while i < nt:
        r = i % nt_save
        nxt = i if r == 0 else i + (nt_save - r)
        if nxt >= nt:
            yield i, nt - i, False
            return
        yield i, nxt - i + 1, True
        i = nxt + 1


def solve(md, *, resume: bool = False, progress: bool = True):
    """Run the transient problem defined by a ModelSetup.

    Returns a dict with the final state, in-memory history arrays, and
    aggregated diagnostics.  Writes the reference-compatible results
    directory when ``md.results_name`` is set.
    """
    md.validate()
    dist_on = bool(getattr(md, "distributed", False)) and len(jax.devices()) > 1
    timesteps = np.asarray(md.timesteps, dtype=np.float64)
    nt = timesteps.size
    nt_save = int(md.nt_save) if md.nt_save else 1
    nt_check = int(md.nt_check) if md.nt_check else max(nt_save * 50, nt_save)
    forcing = make_forcing(timesteps, dtype=md.dtype,
                           seasonal=getattr(md, 'seasonal_inputs', None),
                           degree_day=getattr(md, 'degree_day', None))
    n_saves = -(-nt // nt_save)          # saves at i = 0, nt_save, 2 nt_save, ...
    n_nodes = md.nodes.shape[0]
    state = None

    io_on = md.results_name is not None
    start_step, row = 0, 0

    if io_on:
        rdir = str(md.results_name)
        mesh_fp = ckpt.mesh_fingerprint(md.nodes)
        loaded = (ckpt.load_state(rdir, dtype=md.dtype, fingerprint=mesh_fp)
                  if resume else None)
        if loaded is not None:
            state, start_step, row = loaded
        else:
            try:
                os.makedirs(rdir, exist_ok=False)
            except FileExistsError:
                raise FileExistsError(
                    f"Error: Directory '{rdir}' already exists.\n"
                    "Choose another name in setup file or delete this directory.")
        t_i = np.linspace(0, timesteps.max(), n_saves)
        np.save(os.path.join(rdir, "t.npy"), t_i)
        np.save(os.path.join(rdir, "nodes_x.npy"), md.x)
        np.save(os.path.join(rdir, "nodes_y.npy"), md.y)
        if md.setup_file and os.path.exists(str(md.setup_file)):
            shutil.copy(str(md.setup_file),
                        os.path.join(rdir, os.path.basename(str(md.setup_file))))

    # history rows carry the marching dtype (f32 on TPU): widening to f64
    # would add no information and double the rolling-checkpoint IO volume
    hist = {k: np.zeros((n_saves, n_nodes), dtype=np.dtype(md.dtype))
            for k in ("N", "b", "qx", "qy")}
    log_rows = []
    if io_on and start_step > 0:
        for k in hist:
            f = os.path.join(rdir, f"{k}.npy")
            if os.path.exists(f):
                old = np.load(f)
                m = min(old.shape[0], n_saves)
                hist[k][:m] = old[:m]
        # preserve pre-resume diagnostics (log.csv is rewritten whole)
        logf = os.path.join(rdir, "log.csv")
        if os.path.exists(logf):
            with open(logf) as f:
                log_rows = [tuple(ln.strip().split(","))
                            for ln in f.readlines()[1:]
                            if ln.strip() and int(ln.split(",")[0]) < start_step]

    def write_histories():
        for k in hist:
            np.save(os.path.join(rdir, f"{k}.npy"), hist[k])

    def write_log():
        with open(os.path.join(rdir, "log.csv"), "w") as f:
            f.write("step,t,newton_mean,newton_max,cg_mean,rnorm_max\n")
            for r in log_rows:
                f.write(",".join(str(v) for v in r) + "\n")

    # distributed (node-sharded SPMD) execution through the same protocol:
    # set md.distributed = True (or CLI --dist) with >1 jax device
    import dataclasses as _dc
    if dist_on:
        from shakti_tpu.parallel import halo as _H
        from shakti_tpu.parallel.dist import (gather_state,
                                              make_distributed_runner)
        runner, dist_state0, plan = make_distributed_runner(md)
        if start_step == 0:
            state = dist_state0
        else:
            # localize the checkpointed (global solver-order) state; any
            # carried operator belongs to the single-device formats and is
            # dropped (the dist path rebuilds per-shard operators)
            import jax.numpy as jnp
            state = _dc.replace(state, lag_op=None)
            loc = lambda a: jnp.asarray(
                _H.localize_nodal(plan, np.asarray(a)).reshape(
                    (-1,) + np.asarray(a).shape[1:]), dtype=md.dtype)
            state = jax.tree_util.tree_map(loc, state)
        extract = lambda st: gather_state(plan, st)
        pack_fn = None
    else:
        mesh, static, state0, cfg = md.freeze()
        if state is None:
            state = state0
        elif cfg.lag_operator:
            lag = state.lag_op
            ref = state0.lag_op
            same = (lag is not None and len(lag) == len(ref)
                    and all((a is None) == (b is None)
                            and (a is None or np.asarray(a).shape
                                 == np.asarray(b).shape)
                            for a, b in zip(lag, ref)))
            if not same:
                # checkpoint predates lag persistence or was written under a
                # different operator format/coarse size; reseed (first
                # resumed step then rebuilds instead of reusing)
                from shakti_tpu.solve.newton import zero_lag
                lag = zero_lag(mesh, md.dtype, cfg)
            state = _dc.replace(state, lag_op=lag)
        elif state.lag_op is not None:
            state = _dc.replace(state, lag_op=None)
        step_fn = make_step_fn(mesh, static, md.params, cfg)
        runner = jax.jit(lambda s, d: run_window(step_fn, s, d))
        extract = lambda st: st
        # one concatenated device->host transfer per save window instead of
        # four pulls (each pull costs tens of ms through the TPU tunnel;
        # measured the difference on the bench, see bench.py pack)
        import jax.numpy as jnp
        pack_fn = jax.jit(lambda st: jnp.concatenate(
            [st.N, st.b, st.q[:, 0], st.q[:, 1]]))

    newton_total = cg_total = 0
    t0 = time.time()
    windows = list(_save_windows(nt, nt_save, start_step))
    for w_idx, (i0, wlen, do_save) in enumerate(windows):
        f_win = jax.tree_util.tree_map(lambda a: a[i0:i0 + wlen], forcing)
        state, diags = runner(state, f_win)
        conv = np.asarray(diags["converged"])
        if not conv.all():
            bad = i0 + int(np.argmin(conv))
            if io_on:
                write_histories()
            raise ConvergenceError(
                f"Newton failed to converge at time step {bad} "
                f"(residual {float(np.asarray(diags['rnorm'])[bad - i0]):.3e})")
        ni = np.asarray(diags["newton_iters"])
        ci = np.asarray(diags["cg_iters"])
        newton_total += int(ni.sum())
        cg_total += int(ci.sum())
        last = i0 + wlen - 1
        if do_save:
            # histories are written in the caller's original node order
            # (freeze may renumber nodes for block locality)
            unp = md.node_iperm if md.node_iperm is not None else slice(None)
            if pack_fn is None:
                gs = extract(state)
                vals = (np.asarray(gs.N), np.asarray(gs.b),
                        np.asarray(gs.q[:, 0]), np.asarray(gs.q[:, 1]))
            else:
                flat = np.asarray(pack_fn(state))
                vals = tuple(flat[k * n_nodes:(k + 1) * n_nodes]
                             for k in range(4))
            for k, v in zip(("N", "b", "qx", "qy"), vals):
                hist[k][row] = v[unp]
            log_rows.append((last, float(timesteps[last]), float(ni.mean()),
                             int(ni.max()), float(ci.mean()),
                             float(np.asarray(diags["rnorm"]).max())))
            row += 1
            if io_on and last % nt_check == 0:
                write_histories()
                write_log()
                ckpt.save_state(rdir, extract(state), last + 1, row,
                                fingerprint=mesh_fp)
        if progress and (w_idx + 1) % 10 == 0:
            done = last + 1
            print(f"Time step {done} of {nt} completed ({done / nt * 100:.1f}%)",
                  end="\r", flush=True)

    wall = time.time() - t0
    state = extract(state)
    if io_on:
        write_histories()
        write_log()
        ckpt.save_state(rdir, state, nt, row, fingerprint=mesh_fp)
        import json
        steps_run = nt - start_step
        with open(os.path.join(rdir, "run_meta.json"), "w") as f:
            json.dump({
                "wall_s": round(wall, 1),
                "steps": steps_run,
                "ms_per_step": round(1e3 * wall / max(steps_run, 1), 3),
                "platform": jax.devices()[0].platform,
                "dtype": str(np.dtype(md.dtype)),
                "n_nodes": int(n_nodes),
                "resumed_from": start_step,
            }, f, indent=1)

    return {
        "state": state,
        "history": hist,
        "t": np.linspace(0, timesteps.max(), n_saves),
        "wall_time": wall,
        "newton_iters_total": newton_total,
        "cg_iters_total": cg_total,
        "steps": nt - start_step,
    }

"""HBM roofline of the large-mesh (BCSR-regime) timestep — VERDICT r4 item 2.

For every phase of the 1M-dof single-chip step this script pairs

  * a MEASURED per-iteration time (the phase body runs inside a
    `lax.scan` whose carry THREADS the phase output back into its input,
    so XLA can neither hoist the work out of the loop nor DCE the big
    intermediate — the r2 microbench trap, CLAUDE.md), with
  * an ANALYTIC bytes-moved model (reads + writes of every HBM-resident
    array the phase touches, assuming perfect producer/consumer fusion
    of everything smaller — i.e. a LOWER bound on traffic, hence an
    upper bound on achieved bandwidth),

and reports achieved GB/s against the chip's HBM peak.  Phases far below
peak are launch-/serialization-bound (TPU fine-grained scatters run
~7-17 ns/element regardless of bytes), not bandwidth-bound — those are
the optimization targets; phases near peak are done.

Usage (on TPU; CPU runs work for smoke-testing with --allow-cpu):

    python scripts/roofline.py [nx] [--allow-cpu] [--full]

nx=1000 -> 1M nodes (the VERDICT target scale).  --full additionally
times the complete fused step (at 1M the while-loop program costs
~25 min of tunnel compile; the phase programs are seconds each).
Writes scripts/ROOFLINE.json incrementally (a wedged tunnel keeps the
phases already measured).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shakti_tpu.utils.backend import (enable_compile_cache,  # noqa: E402
                                      ensure_backend,
                                      honor_platforms_env)

enable_compile_cache()          # honors SHAKTI_COMPILE_CACHE (retries on
                                # a wedged tunnel then skip the ~5-10 min
                                # per-phase 1M recompiles)
if "--allow-cpu" in sys.argv:
    # JAX_PLATFORMS env alone is ignored on this host (axon plugin
    # overrides it); pin via jax.config so a CPU smoke run never becomes
    # a tunnel client (CLAUDE.md: one tunnel client at a time)
    honor_platforms_env()
else:
    ensure_backend()

import numpy as np  # noqa: E402

# v5e (TPU v5 lite): 819 GB/s HBM peak per chip (public spec).
HBM_PEAK_GBPS = {"TPU v5 lite": 819.0, "TPU v5e": 819.0,
                 "TPU v4": 1228.0, "TPU v5p": 2765.0, "TPU v6 lite": 1640.0}

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "ROOFLINE.json")


def build_model(nx: int):
    """The scale_bench 1M-dof slab configuration (scripts/scale_bench.py)."""
    from shakti_tpu.api.model import ModelSetup
    from shakti_tpu.mesh.generate import rectangle_mesh
    from shakti_tpu.solve.newton import NewtonConfig

    h = 2000.0
    nodes, cells = rectangle_mesh(nx, nx, nx * h, nx * h, jitter=0.25, seed=0)
    md = ModelSetup(nodes, cells)
    md.solver = NewtonConfig(lag_operator=False, precond="two_level")
    md.z_b = 0.002 * md.x - 100.0
    md.z_s = md.z_b + 1200.0 + 0.001 * (md.x - nx * h / 2)
    md.G = np.full(md.x.size, 0.06)
    md.N_bdry = 3.7e5
    md.OutflowBoundary = lambda p: p[:, 0] < 1e-6
    rng = np.random.default_rng(0)
    md.b_init = np.maximum(0.001 + rng.normal(scale=5e-4, size=md.x.size),
                           1e-5)
    md.N_init = np.full(md.x.size, md.N_bdry)
    md.storage_on = False
    md.operator = "bcsr"        # the >200k-node single-chip format
    md.timesteps = np.linspace(0, 48 * 3600.0, 48)
    md.nt_save = 48
    return md


def main():
    import jax
    import jax.numpy as jnp

    allow_cpu = "--allow-cpu" in sys.argv
    do_full = "--full" in sys.argv
    args = [a for a in sys.argv[1:] if a.isdigit()]
    nx = int(args[0]) if args else 1000
    # --phases a,b,c: measure only the named phases (merging onto the
    # existing ROOFLINE.json) — each 1M phase program is a multi-hundred-
    # MB remote-compile upload on this tunnel, so re-measuring only what
    # a code change touched is the difference between 30 min and 4 h
    only = None
    if "--phases" in sys.argv:
        only = set(sys.argv[sys.argv.index("--phases") + 1].split(","))
    want = lambda name: only is None or name in only

    dev = jax.devices()[0]
    if dev.platform != "tpu" and not allow_cpu:
        print(json.dumps({"error": f"no TPU (got {dev.platform})"}))
        return 9
    jax.block_until_ready(jnp.ones(8).sum())          # gentle tunnel probe
    peak = HBM_PEAK_GBPS.get(dev.device_kind, 819.0)

    from shakti_tpu.physics import residual as res
    from shakti_tpu.solve import krylov
    from shakti_tpu.solve.newton import diag_floor_extra
    from shakti_tpu.solve.precond import (coarse_from_values,
                                          coarse_inverse,
                                          two_level_from_inverse,
                                          vals_coarse_ok)
    from shakti_tpu.solve.timestep import make_step_fn, run_window

    t0 = time.time()
    md = build_model(nx)
    mesh, static, state, cfg = md.freeze()
    p = md.params
    n = int(mesh.n_nodes)
    c = int(mesh.n_cells)
    nq = 6 if cfg.quad_degree >= 4 else cfg.quad_degree + 1
    KI = int(mesh.inc_map.shape[1]) if mesh.inc_map is not None else 0
    print(f"# freeze {time.time() - t0:.0f}s n={n} c={c} "
          f"op={'bcsr' if mesh.bcsr_brow is not None else 'bell'}",
          file=sys.stderr, flush=True)
    if mesh.bcsr_brow is None:
        print(json.dumps({"error": "mesh not in BCSR regime; use nx>=450"}))
        return 8
    B = int(mesh.bcsr_B)
    nnzb = int(mesh.bcsr_brow.shape[0])
    NB = int(mesh.bcsr_NB)
    blk = cfg.coarse_block
    m = -(-n // blk)
    f4 = 4  # f32/int32 itemsize

    # ---------------- analytic bytes model (documented lower bounds) -----
    pre_fields = 9 * c * nq * f4          # Tq,b_q,mdiff,G,inputs,storage,Nn (7) + q_q (2)
    geom = (c * 3 * 2 + c + c * 3) * f4   # grads + area + cells
    inc = (n * KI * 2 + n) * f4           # inc_map + inc_mask + out write
    MB = 1.0 / 1e6
    # ---------------- gather-issue model ---------------------------------
    # XLA TPU serializes fine-grained gathers/scatters; measured on THIS
    # chip (scripts/PROFILE_bgather.json, r3): element gathers ~1.4 ns
    # per gathered element, scatter-adds ~7 ns/element.  For the
    # gather/scatter-built phases the speed of light is that issue rate,
    # not HBM bandwidth — phases near sol_issue_ms are done even when
    # far below hbm peak.
    GATHER_NS, SCATTER_NS = 1.4, 7.0
    # per-phase gathered-element counts (indexed loads only; contiguous
    # streams ride the bytes model): residual = cell->node N gather (3/c)
    # + stacked incidence gather of cell contributions (KI/node);
    # jacobian = 1 primal + 3 tangent passes of the same pattern; fold =
    # 9c block-slot scatter (as stacked gather 9c + index map); coarse =
    # the same fold pattern into the m x m dense Galerkin block.
    gathers = {
        "residual_1": c * 3 + n * KI,
        "residual_multi3": 3 * (c * 3 + n * KI),
        "element_jacobian": 4 * (c * 3) + n * KI,
        "fold": 9 * c,
        "coarse_inverse": 9 * c,
        "coarse_from_vals": 2 * nnzb,    # row-granular mask gathers
        "precompute": 5 * (c * 3) + n * KI,
        "matvec": nnzb * B,      # x gathered per block-column
        "cg_iter": nnzb * B,
        "pc_apply": 0,
    }
    model = {
        "matvec": (nnzb * B * B + 2 * nnzb * B + NB * B + 2 * nnzb) * f4,
        "pc_apply": (4 * n + m * m) * f4,
        # cg iter: matvec + pc + ~5 vector reads/writes x n + 2 dots
        "cg_iter": (nnzb * B * B + 2 * nnzb * B + NB * B) * f4 + (14 * n) * f4
                   + m * m * f4,
        "residual_1": n * f4 + c * 3 * f4 + pre_fields + geom + inc,
        "residual_multi3": n * 3 * f4 + c * 9 * f4 + pre_fields + geom
                           + 3 * inc,
        # primal + 3 tangent passes share the gathered/frozen data one
        # read each in the fused ideal; J write dominates
        "element_jacobian": n * f4 + pre_fields + geom + c * 9 * f4,
        # fold: read J + 2 index maps, write the padded values buffer
        # (zero-init counted once — XLA fuses init+scatter at best)
        "fold": (9 * c * 3) * f4 + nnzb * B * B * f4,
        "coarse_inverse": (9 * c * 3) * f4 + m * m * f4,
        # stream the folded values once + free-mask row gathers + m^2 out
        "coarse_from_vals": (nnzb * B * B + 2 * nnzb * B) * f4 + m * m * f4,
        # 5-field fused gather + quad-point products + outputs
        "precompute": n * 5 * f4 + c * 15 * f4 + 6 * c * nq * f4 + geom,
    }

    results = {"device": f"{dev.platform}:{dev.device_kind}",
               "hbm_peak_GBps": peak, "n_nodes": n, "n_cells": c,
               "B": B, "nnzb": nnzb, "coarse_m": m,
               "vals_MB": round(nnzb * B * B * f4 * MB, 1),
               "true_nnz_MB": round(9 * c * f4 * MB, 1),
               "phases": {}}

    def flush():
        with open(OUT, "w") as f:
            json.dump(results, f, indent=1)

    def record(name, ms, note=""):
        by = model.get(name)
        ent = {"ms": round(ms, 3)}
        if by is not None:
            gbps = by / 1e9 / (ms / 1e3) if ms > 0 else float("nan")
            ent.update(model_MB=round(by * MB, 1),
                       achieved_GBps=round(gbps, 1),
                       pct_peak=round(100 * gbps / peak, 1),
                       sol_ms=round(by / 1e9 / peak * 1e3, 3))
        gel = gathers.get(name)
        if gel is not None:
            # issue-rate speed of light: gathers at the measured ns/el
            # plus the phase's contiguous bytes at hbm peak
            sol_issue = (gel * GATHER_NS / 1e6
                         + (by or 0) / 1e9 / peak * 1e3)
            ent.update(gather_Mel=round(gel / 1e6, 1),
                       sol_issue_ms=round(sol_issue, 3),
                       pct_issue=round(100 * sol_issue / ms, 1)
                       if ms > 0 else None)
        if note:
            ent["note"] = note
        results["phases"][name] = ent

        def _f(v):      # None-safe field formatting (a wedged tunnel can
            return "-" if v is None else v   # yield ms<=0 -> pct None)
        print(f"{name:22s} {ms:9.3f} ms  {_f(ent.get('model_MB')):>8} MB  "
              f"{_f(ent.get('achieved_GBps')):>7} GB/s  "
              f"{_f(ent.get('pct_peak')):>5}% peak  "
              f"{_f(ent.get('pct_issue')):>5}% issue-SoL  {note}",
              file=sys.stderr, flush=True)
        flush()

    def scan_time(body, carry0, k_lo=2, k_hi=10):
        """Per-iteration ms from the k_hi-vs-k_lo scan difference: carry
        feedback defeats hoisting/DCE; the subtraction removes dispatch
        and per-call fixed costs."""
        def run(k):
            f = jax.jit(lambda c0: jax.lax.scan(
                lambda cc, _: (body(cc), None), c0, xs=None, length=k)[0])
            out = f(carry0)
            jax.block_until_ready(out)            # compile + warm
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                out = f(carry0)
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            return best
        return (run(k_hi) - run(k_lo)) / (k_hi - k_lo) * 1e3

    # ---- micro phases (--micro: run these then exit) -----------------
    # pinpoint the residual-vs-jacobian anomaly: element_jacobian (4 AD
    # passes, no accumulation) measured CHEAPER than one residual
    # (1 pass + incidence accumulation) — decompose the residual into
    # gather / corner-math / accumulate to find where the time goes.
    if "--micro" in sys.argv:
        globals()["OUT"] = OUT.replace("ROOFLINE.json",
                                       "ROOFLINE_micro.json")
        from shakti_tpu.fem import ops as fops
        dt = jnp.asarray(3600.0, mesh.nodes.dtype)
        pre = jax.jit(lambda st: res.precompute_step(
            mesh, st.N, st.b, st.q, st.melt, static, dt, p,
            cfg.quad_degree))(state)
        jax.block_until_ready(pre)
        N0 = state.N
        Nc0 = jax.jit(lambda N: fops.gather_cells(mesh, N))(N0)
        contrib = jax.jit(lambda Nc: res.corner_residual(Nc, pre, mesh,
                                                         p))(Nc0)
        jax.block_until_ready(contrib)
        record("m_gather_N", scan_time(
            lambda x: fops.gather_cells(mesh, N0 + 1e-30 * x[0, 0]), Nc0))
        record("m_corner", scan_time(
            lambda cb: res.corner_residual(Nc0 + 1e-30 * cb, pre, mesh, p),
            contrib))
        r0 = jax.jit(lambda cb: fops.scatter_add_cells(mesh, cb))(contrib)
        jax.block_until_ready(r0)
        record("m_scatter_c3", scan_time(
            lambda r: fops.scatter_add_cells(
                mesh, contrib * (1.0 + 1e-30 * r[0])), r0))
        N3 = jnp.stack([N0, N0, N0], axis=1)
        Nc3 = jax.jit(lambda Ns: fops.gather_cells(mesh, Ns))(N3)
        jax.block_until_ready(Nc3)
        record("m_gather_N3", scan_time(
            lambda x: fops.gather_cells(mesh, N3 + 1e-30 * x[0, 0, 0]),
            Nc3))
        c3 = jnp.stack([contrib] * 3, axis=2)                # (c, 3, 3)
        r3 = jax.jit(lambda cb: fops.scatter_add_cells(mesh, cb))(c3)
        jax.block_until_ready(r3)
        record("m_scatter_c3k3", scan_time(
            lambda r: fops.scatter_add_cells(
                mesh, c3 * (1.0 + 1e-30 * r[0, 0])), r3))
        # per-column variant: 3 independent 1-column assemblies (pre rides
        # the carry: constant pre + inc_map together trip the 413 cap)
        def multi_by_cols(Ns, pr):
            return jnp.stack([res.assemble_residual(Ns[:, j], pr, mesh, p)
                              for j in range(3)], axis=1)
        rc = jax.jit(multi_by_cols)(N3, pre)   # pre as ARG (413 cap)
        jax.block_until_ready(rc)
        record("m_multi3_by_cols", scan_time(
            lambda c: (multi_by_cols(N3 + 1e-30 * c[0][0, 0], c[1]), c[1]),
            (rc, pre)))

        # ---- fold variants (BCSR): the element->values scatter is the
        # dominant per-Newton phase at 1M dof (215 ms, r4) — measure
        # whether sortedness/uniqueness hints unlock a faster lowering.
        # The host maps ride the scan carry (args, not constants): 144 MB
        # of extra baked constants would trip the tunnel's 413 cap.
        if mesh.bcsr_brow is not None:
            J0m = jax.jit(lambda N, pr: res.element_jacobian(
                N, pr, mesh, p))(N0, pre)      # pre as ARG (413 cap)
            jax.block_until_ready(J0m)
            Bb = int(mesh.bcsr_B)
            nnzbm = int(mesh.bcsr_brow.shape[0])
            blkm = np.asarray(mesh.bcsr_blk, np.int64)
            offm = np.asarray(mesh.bcsr_off, np.int64)
            fslot = blkm * (Bb * Bb) + offm
            perm = np.argsort(fslot, kind="stable")
            sl = fslot[perm]
            uniq, seg0 = np.unique(sl, return_index=True)
            seg_id = np.zeros(sl.size, np.int32)
            seg_id[seg0[1:]] = 1
            seg_id = np.cumsum(seg_id, dtype=np.int32)
            U = int(uniq.size)
            args0 = (jnp.asarray(perm.astype(np.int32)),
                     jnp.asarray((sl // (Bb * Bb)).astype(np.int32)),
                     jnp.asarray((sl % (Bb * Bb)).astype(np.int32)),
                     jnp.asarray(seg_id),
                     jnp.asarray((uniq // (Bb * Bb)).astype(np.int32)),
                     jnp.asarray((uniq % (Bb * Bb)).astype(np.int32)))
            print(f"# fold variants: U={U} ({U / sl.size:.2%} unique)",
                  file=sys.stderr, flush=True)

            v0 = jax.jit(lambda J: res.fold_operator_values(J, mesh))(J0m)
            jax.block_until_ready(v0)
            record("m_fold_scatter", scan_time(
                lambda v: res.fold_operator_values(
                    J0m * (1.0 + 1e-30 * v[0, 0, 0]), mesh), v0))

            def fold_sorted(carry):
                v, (pj, bs, os_, sid, ub, uo) = carry
                flat = (J0m * (1.0 + 1e-30 * v[0, 0, 0])).reshape(-1)[pj]
                nv = jnp.zeros((nnzbm, Bb * Bb), flat.dtype)
                nv = nv.at[bs, os_].add(flat, indices_are_sorted=True)
                return (nv.reshape(nnzbm, Bb, Bb),
                        (pj, bs, os_, sid, ub, uo))
            record("m_fold_sorted", scan_time(fold_sorted, (v0, args0)))

            def fold_seg_unique(carry):
                v, (pj, bs, os_, sid, ub, uo) = carry
                flat = (J0m * (1.0 + 1e-30 * v[0, 0, 0])).reshape(-1)[pj]
                u = jax.ops.segment_sum(flat, sid, num_segments=U,
                                        indices_are_sorted=True)
                nv = jnp.zeros((nnzbm, Bb * Bb), flat.dtype)
                nv = nv.at[ub, uo].add(u, indices_are_sorted=True,
                                       unique_indices=True)
                return (nv.reshape(nnzbm, Bb, Bb),
                        (pj, bs, os_, sid, ub, uo))
            record("m_fold_seg_unique",
                   scan_time(fold_seg_unique, (v0, args0)))
        flush()
        print(json.dumps({"roofline": OUT, "mode": "micro"}))
        return 0

    # settle one short window so the state is physical (2 steps)
    step = make_step_fn(mesh, static, p, cfg)
    dts = jnp.full((2,), 3600.0, mesh.nodes.dtype)
    # skip the full-step program unless --full: at 1M its compile is ~25
    # tunnel-minutes; the phase programs below compile in seconds.
    dt = jnp.asarray(3600.0, mesh.nodes.dtype)
    pre = jax.jit(lambda st: res.precompute_step(
        mesh, st.N, st.b, st.q, st.melt, static, dt, p,
        cfg.quad_degree))(state)
    jax.block_until_ready(pre)
    N0 = state.N
    dirichlet = static.dirichlet
    if only is not None and os.path.exists(OUT):
        # merge: keep same-scale phases not being re-measured
        try:
            with open(OUT) as f:
                prior = json.load(f)
            if prior.get("n_nodes") == n:
                results["phases"].update(prior.get("phases", {}))
        except Exception:
            pass

    # ---- precompute: carry the pre pytree itself (forces materialization)
    def body_pre(pr):
        return res.precompute_step(
            mesh, state.N, state.b * (1.0 + 1e-30 * pr.Tq[0, 0]),
            state.q, state.melt, static, dt, p, cfg.quad_degree)
    if want("precompute"):
        record("precompute", scan_time(body_pre, pre))

    # ---- residual assemblies ----
    # pre rides the scan CARRY in these phases (and is an ARG of the
    # one-shot jits): as a closure constant its ~500 MB of quad-point
    # fields sit just under the tunnel's remote-compile request cap, and
    # the inc_map constants (r5) pushed the residual programs over it
    # (HTTP 413); as constants they also make every phase compile a
    # multi-hundred-MB upload
    r0 = jax.jit(lambda N, pr: res.assemble_residual(N, pr, mesh, p))(
        N0, pre)
    jax.block_until_ready(r0)
    if want("residual_1"):
        record("residual_1", scan_time(
            lambda c: (res.assemble_residual(N0 + 1e-30 * c[0], c[1],
                                             mesh, p), c[1]), (r0, pre)))

    if want("residual_multi3"):
        r3 = jax.jit(lambda N, pr: res.assemble_residual_multi(
            jnp.stack([N, N * (1 + 1e-7), N * (1 - 1e-7)], axis=1),
            pr, mesh, p))(N0, pre)
        jax.block_until_ready(r3)
        record("residual_multi3", scan_time(
            lambda c: (res.assemble_residual_multi(
                jnp.stack([N0 + 1e-30 * c[0][:, 0], N0 * (1 + 1e-7),
                           N0 * (1 - 1e-7)], axis=1), c[1], mesh, p),
                c[1]), (r3, pre)))

    # ---- element Jacobian (carry J: materialized every iteration) ----
    J0 = jax.jit(lambda N, pr: res.element_jacobian(N, pr, mesh, p))(
        N0, pre)
    jax.block_until_ready(J0)
    if want("element_jacobian"):
        record("element_jacobian", scan_time(
            lambda c: (res.element_jacobian(N0 + 1e-30 * c[0][0, 0, 0],
                                            c[1], mesh, p), c[1]),
            (J0, pre)))

    need_vals = only is None or (only & {"fold", "coarse_from_vals",
                                         "matvec", "pc_apply", "cg_iter"})
    if need_vals:
        # ---- fold (the scatter-add under test; carry vals) ----
        vals0 = jax.jit(lambda J: res.fold_operator_values(J, mesh))(J0)
        jax.block_until_ready(vals0)
        if want("fold"):
            record("fold", scan_time(
                lambda v: res.fold_operator_values(
                    J0 * (1.0 + 1e-30 * v[0, 0, 0]), mesh), vals0))

    # ---- coarse inverse (two-level PC build) ----
    need_ainv = only is None or (only & {"coarse_inverse",
                                         "coarse_from_vals", "pc_apply",
                                         "cg_iter"})
    if need_ainv:
        Ainv0 = jax.jit(lambda J: coarse_inverse(J, mesh, dirichlet,
                                                 blk))(J0)
        jax.block_until_ready(Ainv0)
        if want("coarse_inverse"):
            record("coarse_inverse", scan_time(
                lambda A: coarse_inverse(J0 * (1.0 + 1e-30 * A[0, 0]),
                                         mesh, dirichlet, blk),
                Ainv0, k_lo=2, k_hi=6))

    # ---- coarse inverse rebuilt from folded values (r5 scatter-free path)
    if want("coarse_from_vals") and vals_coarse_ok(mesh, blk):
        def cfv_body(cv):
            v, A = cv
            return (v, coarse_from_values(v * (1.0 + 1e-30 * A[0, 0]),
                                          mesh, dirichlet, blk))
        record("coarse_from_vals",
               scan_time(cfv_body, (vals0, Ainv0), k_lo=2, k_hi=6))

    if only is None or (only & {"matvec", "pc_apply", "cg_iter"}):
        a_diag = jax.jit(
            lambda v: res.operator_diag_from_values(v, mesh))(vals0)
        extra = jax.jit(lambda ad: diag_floor_extra(
            ad, dirichlet, mesh, cfg.diag_floor_rel))(a_diag)
        a_diag = a_diag + extra
        jax.block_until_ready(a_diag)

        # ---- operator matvec ----
        # vals0 rides the scan CARRY, not the closure: as a baked constant
        # the ~1.1 GB values array blows the tunnel's remote-compile
        # request cap (HTTP 413 — the r4 matvec-phase failure).  The
        # fixed-cost subtraction in scan_time removes the arg-transfer
        # difference.
        def mv_body(cv):
            v, x = cv
            y = res.operator_from_values(v, mesh, dirichlet)(x) + extra * x
            return (v, y / jnp.linalg.norm(y))
        if want("matvec"):
            record("matvec", scan_time(mv_body, (vals0, r0),
                                       k_lo=2, k_hi=18))

        # ---- preconditioner apply ----
        minv = two_level_from_inverse(Ainv0, a_diag, dirichlet, blk, n)
        if want("pc_apply"):
            record("pc_apply", scan_time(
                lambda x: (lambda y: y / jnp.linalg.norm(y))(minv(x)), r0,
                k_lo=2, k_hi=18))

        # ---- CG per iteration (forced iters, fixed operator) ----
        def cg_k(k):
            def run_cg(v, r):
                mv = res.operator_from_values(v, mesh, dirichlet)
                return krylov.pcg(lambda x: mv(x) + extra * x, r, minv,
                                  rtol=0.0, atol=0.0, maxiter=k)[0]
            f = jax.jit(run_cg)     # vals as ARG (not a 1.1 GB constant)
            out = f(vals0, r0)
            jax.block_until_ready(out)
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                out = f(vals0, r0)
                jax.block_until_ready(out)
                best = min(best, time.perf_counter() - t0)
            return best
        if want("cg_iter"):
            record("cg_iter", (cg_k(12) - cg_k(2)) / 10 * 1e3)

    # ---- full fused step (optional: big compile) ----
    if do_full:
        runner = jax.jit(lambda s, d: run_window(step, s, d))
        t0 = time.time()
        s1, diag = runner(state, jnp.full((4,), 3600.0, mesh.nodes.dtype))
        jax.block_until_ready(s1)
        print(f"# full-step compile+4 steps {time.time() - t0:.0f}s",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        s2, diag = runner(s1, jnp.full((4,), 3600.0, mesh.nodes.dtype))
        jax.block_until_ready(s2)
        ms = (time.perf_counter() - t0) / 4 * 1e3
        record("full_step", ms,
               note=f"newton_mean="
                    f"{float(np.asarray(diag['newton_iters']).mean()):.2f} "
                    f"cg_mean="
                    f"{float(np.asarray(diag['cg_iters']).mean()):.1f}")

    # ---- derived budget: what the phase model predicts a step costs ----
    ph = results["phases"]
    nm, cgm = 2.0, 6.0        # typical warm-run Newton/CG counts at 1M
    if do_full and "full_step" in ph:
        note = ph["full_step"]["note"]
        nm = float(note.split("newton_mean=")[1].split()[0])
        cgm = float(note.split("cg_mean=")[1].split()[0])
    needed = ("precompute", "residual_multi3", "element_jacobian", "fold",
              "residual_1", "cg_iter")
    if all(k in ph for k in needed) and (
            "coarse_from_vals" in ph or "coarse_inverse" in ph):
        coarse = ph.get("coarse_from_vals", ph.get("coarse_inverse"))
        budget = (ph["precompute"]["ms"] + ph["residual_multi3"]["ms"]
                  + nm * (ph["element_jacobian"]["ms"] + ph["fold"]["ms"]
                          + coarse["ms"]
                          + ph["residual_1"]["ms"])
                  + cgm * ph["cg_iter"]["ms"])
        results["derived"] = {
            "newton_mean_assumed": nm, "cg_mean_assumed": cgm,
            "solver_budget_ms": round(budget, 1),
            "note": "budget excludes the explicit-update tail and launch "
                    "gaps",
        }
    flush()
    print(json.dumps({"roofline": OUT,
                      "solver_budget_ms": results.get("derived", {}).get(
                          "solver_budget_ms")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

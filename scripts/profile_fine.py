"""Fine-grained in-scan attribution of the bench step (follow-up to
profile_inscan.py — which showed the step is launch-bound on the tunnel).

Measures, each inside a 24-iteration lax.scan at the settled bench state:

  * calibration: per-kernel in-program launch cost (barrier-separated
    trivial elementwise kernels, slope between k=4 and k=36),
  * explicit-phase sub-stages (gather/grads -> +node-avg -> +q/melt ->
    full explicit),
  * operator matvec / two-level PC apply / CG-iteration slopes
    (fixed-iteration solves, slope between maxiter=1 and maxiter=5),
  * probe-assembly column cost (assemble_residual_multi k=1/2/3),

and dumps the compiled HLO of the full lagged step to /tmp for offline
kernel-sequence analysis.  Writes scripts/PROFILE_fine.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shakti_tpu.utils.backend import ensure_backend

ensure_backend()


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    if (dev.platform != "tpu"
            and os.environ.get("SHAKTI_PROFILE_ALLOW_CPU", "0") != "1"):
        print(f"# device is {dev.platform}, not tpu — bailing", file=sys.stderr)
        return 3
    jax.block_until_ready(jnp.ones(8).sum())

    from bench import build_bench_model
    from shakti_tpu.fem import ops
    from shakti_tpu.physics import constitutive as law
    from shakti_tpu.physics import residual as res
    from shakti_tpu.solve import krylov
    from shakti_tpu.solve.precond import two_level_from_inverse
    from shakti_tpu.solve.timestep import (make_step_fn, run_window,
                                           timestep_sizes)

    md = build_bench_model()
    mesh, static, state0, cfg = md.freeze()
    p = md.params
    dts = timestep_sizes(md.timesteps, dtype=md.dtype)
    W = 24

    step_full = make_step_fn(mesh, static, p, cfg)
    warm = jax.jit(lambda s, d: run_window(step_full, s, d))
    state = state0
    for w in range(4):
        state, diag = warm(state, dts[w * W:(w + 1) * W])
    jax.block_until_ready(state.N)
    dt = float(dts[4 * W])
    sq = res.static_quad_fields(mesh, static, cfg.quad_degree,
                                mesh.nodes.dtype)
    pre = jax.jit(lambda s: res.precompute_step(
        mesh, s.N, s.b, s.q, s.melt, static, dt, p, cfg.quad_degree,
        sq=sq))(state)
    jax.block_until_ready(pre.Tq)
    # settled carried operator (ok, age, vals, a_diag, A_inv, floor)
    _, _, vals, a_diag, A_inv, floor_b = state.lag_op
    dirichlet = static.dirichlet
    dmax = float(jax.jit(lambda a: jnp.max(jnp.abs(a)))(a_diag))

    def timeit(runner, *args, reps=6):
        out = runner(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = runner(*args)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / (reps * W) * 1e3

    results = {}

    def record(name, ms, note=""):
        results[name] = round(ms, 4)
        print(f"{name:24s} {ms:8.4f} ms/step  {note}", file=sys.stderr,
              flush=True)

    # ---------------- calibration: per-kernel launch cost ----------------
    def cal(k):
        def body(x, d):
            for _ in range(k):
                x = jax.lax.optimization_barrier(x + d)
            return x, ()
        return jax.jit(lambda x, ds: jax.lax.scan(body, x, ds))

    x0 = jnp.zeros((int(mesh.n_nodes),), md.dtype)
    t4 = timeit(cal(4), x0, dts[:W] * 0.0)
    t36 = timeit(cal(36), x0, dts[:W] * 0.0)
    record("cal_k4", t4)
    record("cal_k36", t36)
    per_kernel = (t36 - t4) / 32.0
    record("per_kernel_launch", per_kernel, "(slope, trivial fusion)")

    # ---------------- explicit-phase sub-stages ----------------
    def scan_of(fn):
        return jax.jit(lambda s, ds: jax.lax.scan(fn, s, ds))

    def stage_gather(s, d):
        st = jnp.stack([s.N, s.b, s.melt], axis=1)
        sc = ops.gather_cells(mesh, st)
        dev_ = sc - jnp.mean(sc, axis=1, keepdims=True)
        g = jnp.sum(dev_[:, :, :, None] * mesh.grads[:, :, None, :], axis=1)
        grad_h_c = static.gb0 - g[:, 0] / (p.rho_w * p.g)
        grad_b_c, grad_m_c = g[:, 1], g[:, 2]
        b_cell, melt_cell = sc[:, :, 1], sc[:, :, 2]
        mdiff_old_ci = law.melt_regularization(
            b_cell, melt_cell, grad_b_c[:, None, :], grad_m_c[:, None, :])
        return (grad_h_c, grad_b_c, b_cell, melt_cell, mdiff_old_ci)

    def e0(s, d):
        out = stage_gather(s, d)
        return s, sum(jnp.sum(o) for o in out)

    def stage_avg(s, d):
        grad_h_c, grad_b_c, b_cell, melt_cell, mdiff_old_ci = stage_gather(s, d)
        pack = jnp.concatenate(
            [jnp.broadcast_to(grad_h_c[:, None, :],
                              grad_h_c.shape[:1] + (3, 2)),
             mdiff_old_ci[:, :, None]], axis=-1)
        avg = ops.cellnodal_to_node_avg(mesh, pack)
        return (avg[:, :2], avg[:, 2], grad_h_c, grad_b_c, b_cell, melt_cell,
                mdiff_old_ci)

    def e1(s, d):
        out = stage_avg(s, d)
        return s, sum(jnp.sum(o) for o in out)

    def stage_qmelt(s, d):
        (grad_h_n, mdiff_old_n, grad_h_c, grad_b_c, b_cell, melt_cell,
         mdiff_old_ci) = stage_avg(s, d)
        Re = law.reynolds(s.q, p)
        q = law.water_flux(s.b, grad_h_n, Re, p)
        m0 = law.melt_opening(q, grad_h_n, static.G, p)
        melt = m0 + mdiff_old_n
        return q, m0, melt, grad_b_c, b_cell

    def e2(s, d):
        out = stage_qmelt(s, d)
        return s, sum(jnp.sum(o) for o in out)

    def e3(s, d):
        q, m0, melt, grad_b_c, b_cell = stage_qmelt(s, d)
        melt_cell_new = ops.gather_cells(mesh, melt)
        m_dev = melt_cell_new - jnp.mean(melt_cell_new, axis=1, keepdims=True)
        grad_m_new = jnp.sum(m_dev[:, :, None] * mesh.grads, axis=1)
        mdiff_new_ci = law.melt_regularization(
            b_cell, melt_cell_new, grad_b_c[:, None, :],
            grad_m_new[:, None, :])
        melt_for_b = m0 + ops.cellnodal_to_node_avg(mesh, mdiff_new_ci)
        b = s.b + d * (melt_for_b / p.rho_i - law.closure(s.b, s.N, p))
        b = jnp.maximum(b, static.b_min)
        s2 = dataclasses.replace(s, b=b, q=q, melt=melt)
        return s2, ()

    record("exp_gather_grads", timeit(scan_of(e0), state, dts[:W]))
    record("exp_plus_avg1", timeit(scan_of(e1), state, dts[:W]))
    record("exp_plus_qmelt", timeit(scan_of(e2), state, dts[:W]))
    record("exp_full", timeit(scan_of(e3), state, dts[:W]))

    # ---------------- operator matvec / PC / CG slopes ----------------
    matvec0 = res.operator_from_values(vals, mesh, dirichlet)
    extra = jnp.where(dirichlet, 0.0,
                      jnp.maximum(0.0, cfg.diag_floor_rel * dmax - a_diag))
    matvec = lambda x: matvec0(x) + extra * x
    minv = two_level_from_inverse(A_inv, a_diag + extra, dirichlet,
                                  cfg.coarse_block, mesh.n_nodes)
    scale = 1.0 / (4.0 * dmax)
    xseed = jnp.where(dirichlet, 0.0, jnp.ones_like(a_diag))

    def mv_chain(k):
        def body(y, d):
            for _ in range(k):
                y = matvec(y) * scale + xseed * 1e-3
            return y, ()
        return jax.jit(lambda y, ds: jax.lax.scan(body, y, ds))

    mv1 = timeit(mv_chain(1), xseed, dts[:W])
    mv5 = timeit(mv_chain(5), xseed, dts[:W])
    record("matvec_x1", mv1)
    record("matvec_x5", mv5)
    record("matvec_each", (mv5 - mv1) / 4.0, "(slope)")

    def pc_chain(k):
        def body(y, d):
            for _ in range(k):
                y = minv(y) * (dmax * 0.25) + xseed * 1e-3
            return y, ()
        return jax.jit(lambda y, ds: jax.lax.scan(body, y, ds))

    pc1 = timeit(pc_chain(1), xseed, dts[:W])
    pc5 = timeit(pc_chain(5), xseed, dts[:W])
    record("pc_x1", pc1)
    record("pc_x5", pc5)
    record("pc_each", (pc5 - pc1) / 4.0, "(slope)")

    rhs = jax.jit(lambda s: jnp.where(dirichlet, 0.0,
                                      res.assemble_residual(s.N, pre, mesh,
                                                            p)))(state)
    jax.block_until_ready(rhs)

    def cg_fixed(m):
        def body(c, d):
            x, _ = krylov.pcg(matvec, rhs + c * 0.0, minv, rtol=0.0,
                              atol=0.0, maxiter=m)
            return jnp.sum(x) * 1e-30, ()
        return jax.jit(lambda c, ds: jax.lax.scan(body, c, ds))

    cg1 = timeit(cg_fixed(1), jnp.asarray(0.0, md.dtype), dts[:W])
    cg5 = timeit(cg_fixed(5), jnp.asarray(0.0, md.dtype), dts[:W])
    record("cg_maxiter1", cg1)
    record("cg_maxiter5", cg5)
    record("cg_per_iter", (cg5 - cg1) / 4.0, "(slope)")

    # ---------------- probe-assembly column cost ----------------
    eps = jnp.asarray(jnp.finfo(md.dtype).eps, md.dtype)
    sign = jnp.where(jnp.arange(mesh.n_nodes) % 2 == 0, 1.0,
                     -1.0).astype(md.dtype)

    def multi(k):
        colsrc = [state.N, 2 * state.N - state.N_prev,
                  state.N + eps * jnp.abs(state.N) * sign][:k]

        def body(s, d):
            cols = res.assemble_residual_multi(
                jnp.stack([c + 0.0 * s for c in colsrc], axis=1), pre, mesh, p)
            return s, jnp.linalg.norm(cols, axis=0)
        return jax.jit(lambda s, ds: jax.lax.scan(body, s, ds))

    z = jnp.asarray(0.0, md.dtype)
    m1 = timeit(multi(1), z, dts[:W])
    m2 = timeit(multi(2), z, dts[:W])
    m3 = timeit(multi(3), z, dts[:W])
    record("assemble_1col", m1)
    record("assemble_2col", m2)
    record("assemble_3col", m3)

    # ---------------- HLO dump of the full lagged step ----------------
    txt = warm.lower(state, dts[:W]).compile().as_text()
    hlo_path = "/tmp/hlo_full_lag.txt"
    with open(hlo_path, "w") as f:
        f.write(txt)
    import re
    kinds = {}
    for op in re.findall(r"= \S+ (fusion|custom-call|copy|while|conditional|"
                         r"all-reduce|dynamic-slice|dynamic-update-slice|"
                         r"gather|scatter|reduce|dot|convolution|transpose|"
                         r"concatenate|pad|reshape|broadcast|select|iota|"
                         r"bitcast)", txt):
        kinds[op] = kinds.get(op, 0) + 1
    results["hlo_kind_counts"] = kinds
    print(f"# HLO dumped to {hlo_path}: {kinds}", file=sys.stderr)

    out = {"device": f"{dev.platform}:{dev.device_kind}",
           "n_nodes": int(mesh.n_nodes), "results": results}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "PROFILE_fine.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"profile": path}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

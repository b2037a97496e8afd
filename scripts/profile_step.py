"""Per-phase kernel profile of the bench-scale timestep (VERDICT r1 item 4/5).

Decomposes the 12.3k-dof Cook_E2-scale step into its phases, times each as a
separately jitted program on the real device, counts compiled fusion kernels
per phase (HLO), and benches the Pallas block-ELL SpMV against the XLA path.

Writes scripts/PROFILE.json + prints a human summary.  Run on TPU:

    python scripts/profile_step.py

Exit code 3 when the device is not a TPU (so retry wrappers can bail fast —
the axon tunnel intermittently falls back to CPU, CLAUDE.md).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shakti_tpu.utils.backend import ensure_backend

ensure_backend()


def timeit(fn, *args, repeats=20, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats * 1e3  # ms


def kernel_count(jitted, *args):
    """Number of fusion/custom kernels in the compiled module (static count;
    while-loop bodies count once though they execute per iteration)."""
    try:
        txt = jitted.lower(*args).compile().as_text()
    except Exception:
        return -1
    import re
    return len(re.findall(r" fusion(?:\.\d+)?\(", txt))


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    if dev.platform != "tpu":
        print(f"# device is {dev.platform}, not tpu — bailing", file=sys.stderr)
        return 3
    # wake the tunnel gently before the big compiles
    jax.block_until_ready(jnp.ones(8).sum())

    from bench import build_bench_model
    from shakti_tpu.fem import bell as bellm
    from shakti_tpu.ops.spmv_pallas import bell_matvec_pallas
    from shakti_tpu.physics import residual as res
    from shakti_tpu.solve import krylov
    from shakti_tpu.solve.precond import make_two_level
    from shakti_tpu.solve.timestep import (State, make_step_fn, run_window,
                                           timestep_sizes)

    md = build_bench_model()
    mesh, static, state, cfg = md.freeze()
    p = md.params
    step = make_step_fn(mesh, static, p, cfg)
    dts = timestep_sizes(md.timesteps, dtype=md.dtype)
    win = int(md.nt_save)

    runner = jax.jit(lambda s, d: run_window(step, s, d))
    # settle transients so phase timings reflect steady operation
    state, diag = runner(state, dts[:win])
    state, diag = runner(state, dts[win:2 * win])
    jax.block_until_ready(state)
    dt = dts[2 * win]

    results = {}

    def record(name, ms, kc=None, note=""):
        results[name] = {"ms": round(ms, 4), "kernels": kc, "note": note}
        print(f"{name:24s} {ms:9.3f} ms   kernels={kc}   {note}",
              file=sys.stderr)

    # ---- full step (window-amortized, the bench number) ----
    t0 = time.perf_counter()
    s2, d2 = runner(state, dts[2 * win:3 * win])
    jax.block_until_ready(s2)
    s3, d3 = runner(s2, dts[3 * win:4 * win])
    jax.block_until_ready(s3)
    full_ms = (time.perf_counter() - t0) / (2 * win) * 1e3
    record("full_step", full_ms, kernel_count(runner, state, dts[:win]),
           f"newton_mean={float(np.asarray(d3['newton_iters']).mean()):.2f} "
           f"cg_mean={float(np.asarray(d3['cg_iters']).mean()):.2f}")

    # ---- phase: per-step precompute (frozen quad fields) ----
    f_pre = jax.jit(lambda st: res.precompute_step(
        mesh, st.N, st.b, st.q, st.melt, static, dt, p, cfg.quad_degree))
    record("precompute_step", timeit(f_pre, state), kernel_count(f_pre, state))
    pre = f_pre(state)
    jax.block_until_ready(pre)

    # ---- phase: single residual assembly ----
    f_res = jax.jit(lambda N: res.assemble_residual(N, pre, mesh, p))
    record("residual_1x", timeit(f_res, state.N), kernel_count(f_res, state.N))

    # ---- phase: batched residual+probe (the Newton entry assembly) ----
    f_multi = jax.jit(lambda N: res.assemble_residual_multi(
        jnp.stack([N, N, N * (1 + 1e-7)], axis=1), pre, mesh, p))
    record("residual_multi3", timeit(f_multi, state.N),
           kernel_count(f_multi, state.N))

    # ---- phase: element Jacobian (AD) ----
    f_jac = jax.jit(lambda N: res.element_jacobian(N, pre, mesh, p))
    record("element_jacobian", timeit(f_jac, state.N),
           kernel_count(f_jac, state.N))
    J_c = f_jac(state.N)
    jax.block_until_ready(J_c)

    # ---- phase: operator fold (element -> block-ELL) + diag ----
    NB, KB = mesh.bell_nbr.shape
    B = mesh.bell_B
    f_fold = jax.jit(lambda Jc: bellm.bell_from_elements(
        -Jc, mesh.bell_map, NB, KB, B))
    record("operator_fold", timeit(f_fold, J_c), kernel_count(f_fold, J_c))
    vals = f_fold(J_c)
    jax.block_until_ready(vals)
    a_diag = jax.jit(lambda v: bellm.bell_diag(v, mesh.bell_diag_pos))(vals)

    # ---- phase: two-level preconditioner build (coarse asm + inv) ----
    dirichlet = static.dirichlet
    f_pc = jax.jit(lambda Jc, ad, r: make_two_level(
        Jc, mesh, dirichlet, ad, cfg.coarse_block)(r))
    record("precond_build+apply", timeit(f_pc, J_c, a_diag, state.N),
           kernel_count(f_pc, J_c, a_diag, state.N))

    # ---- phase: SpMV (XLA bell vs Pallas) ----
    n = mesh.n_nodes
    f_mv = jax.jit(lambda v, x: bellm.bell_matvec(v, mesh.bell_nbr, x, n))
    ms_xla = timeit(f_mv, vals, state.N, repeats=50)
    record("spmv_bell_xla", ms_xla, kernel_count(f_mv, vals, state.N))
    try:
        f_pl = jax.jit(lambda v, x: bell_matvec_pallas(v, mesh.bell_nbr, x, n))
        ms_pl = timeit(f_pl, vals, state.N, repeats=50)
        record("spmv_bell_pallas", ms_pl, kernel_count(f_pl, vals, state.N))
        err = float(jnp.linalg.norm(f_pl(vals, state.N) - f_mv(vals, state.N))
                    / jnp.linalg.norm(f_mv(vals, state.N)))
        results["spmv_bell_pallas"]["rel_err_vs_xla"] = err
    except Exception as e:  # Mosaic compile failures shouldn't kill the run
        record("spmv_bell_pallas", float("nan"), None, f"FAILED: {e}")

    # ---- phase: CG cost per iteration (fixed operator, forced iters) ----
    def cg_fixed(k):
        def run(r):
            matvec0 = lambda x: bellm.bell_matvec(
                vals, mesh.bell_nbr, jnp.where(dirichlet, 0.0, x), n)
            matvec = lambda x: jnp.where(dirichlet, x, matvec0(x))
            minv = make_two_level(J_c, mesh, dirichlet, a_diag,
                                  cfg.coarse_block)
            x, info = krylov.pcg(matvec, r, minv, rtol=0.0, atol=0.0,
                                 maxiter=k)
            return x
        return jax.jit(run)
    r0 = f_res(state.N)
    t2 = timeit(cg_fixed(2), r0)
    t10 = timeit(cg_fixed(10), r0)
    record("cg_per_iter", (t10 - t2) / 8.0, None,
           f"(k=2: {t2:.3f} ms, k=10: {t10:.3f} ms; incl. PC build)")

    # ---- phase: explicit updates (step with the Newton loop disabled) ----
    import dataclasses
    cfg0 = dataclasses.replace(cfg, max_iter=0, extrapolate_guess=False)
    step0 = make_step_fn(mesh, static, p, cfg0)
    f_exp = jax.jit(lambda s: step0(s, dt))
    record("step_no_newton", timeit(f_exp, state),
           kernel_count(f_exp, state),
           "(pre + probe-assembly + explicit updates)")

    # ---- single unfused step, for scan-overhead comparison ----
    f_one = jax.jit(lambda s: step(s, dt))
    record("step_single_launch", timeit(f_one, state),
           kernel_count(f_one, state))

    out = {
        "device": f"{dev.platform}:{dev.device_kind}",
        "n_nodes": int(mesh.n_nodes),
        "dtype": str(np.dtype(md.dtype)),
        "phases": results,
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "PROFILE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"profile": path, "full_step_ms": results["full_step"]["ms"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

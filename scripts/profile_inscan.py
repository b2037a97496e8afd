"""In-program per-phase attribution of the bench step (follow-up to
profile_step.py, whose standalone-launch timings are dominated by the
axon tunnel's per-launch cost).

Each phase is measured INSIDE a 24-iteration lax.scan so launch overhead
amortizes away; successive variants add one phase, so differences are
honest in-program costs.  Also records static fusion-kernel counts per
compiled variant.  Writes scripts/PROFILE_inscan.json.
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
    if dev.platform != "tpu":
        print(f"# device is {dev.platform}, not tpu — bailing", file=sys.stderr)
        return 3
    jax.block_until_ready(jnp.ones(8).sum())

    from bench import build_bench_model
    from shakti_tpu.physics import residual as res
    from shakti_tpu.solve.timestep import (make_step_fn, run_window,
                                           timestep_sizes)

    md = build_bench_model()
    mesh, static, state0, cfg = md.freeze()
    p = md.params
    dts = timestep_sizes(md.timesteps, dtype=md.dtype)
    W = 24

    # settle to steady state with the real step first
    step_full = make_step_fn(mesh, static, p, cfg)
    warm = jax.jit(lambda s, d: run_window(step_full, s, d))
    state = state0
    for w in range(4):
        state, diag = warm(state, dts[w * W:(w + 1) * W])
    jax.block_until_ready(state.N)
    dt = dts[4 * W]
    sq = res.static_quad_fields(mesh, static, cfg.quad_degree,
                                mesh.nodes.dtype)

    def timeit(runner, s, reps=6):
        out = runner(s, dts[:W])
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = runner(s, dts[:W])
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])
        return (time.perf_counter() - t0) / (reps * W) * 1e3

    def kcount(runner, s):
        import re
        txt = runner.lower(s, dts[:W]).compile().as_text()
        return len(re.findall(r" fusion(?:\.\d+)?\(", txt))

    results = {}

    def scan_of(fn):
        def body(s, d):
            return fn(s, d)
        return jax.jit(lambda s, ds: jax.lax.scan(body, s, ds))

    # ---- v0: precompute only ----
    def v_pre(s, d):
        pre = res.precompute_step(mesh, s.N, s.b, s.q, s.melt, static, d, p,
                                  cfg.quad_degree, sq=sq)
        # fold to keep all outputs live without changing state shape
        return s, jnp.sum(pre.Tq[0]) + jnp.sum(pre.mdiff_q[0])

    # ---- v1: + the batched residual/probe assembly ----
    def v_probe(s, d):
        pre = res.precompute_step(mesh, s.N, s.b, s.q, s.melt, static, d, p,
                                  cfg.quad_degree, sq=sq)
        eps = jnp.asarray(jnp.finfo(s.N.dtype).eps, s.N.dtype)
        sign = jnp.where(jnp.arange(s.N.shape[0]) % 2 == 0, 1.0,
                         -1.0).astype(s.N.dtype)
        cols = res.assemble_residual_multi(
            jnp.stack([s.N, 2 * s.N - s.N_prev,
                       s.N + eps * jnp.abs(s.N) * sign], axis=1),
            pre, mesh, p)
        return s, jnp.linalg.norm(cols, axis=0)

    # ---- v2: full step minus Newton (max_iter=0) ----
    cfg0 = dataclasses.replace(cfg, max_iter=0, lag_operator=False)
    step0 = make_step_fn(mesh, static, p, cfg0)
    st_nolag = dataclasses.replace(state, lag_op=None)

    # ---- v3: full step, lagged operator (the bench config) ----
    # ---- v4: full step, plain Newton ----
    cfg_plain = dataclasses.replace(cfg, lag_operator=False)
    step_plain = make_step_fn(mesh, static, p, cfg_plain)

    variants = [
        ("pre_only", scan_of(v_pre), state),
        ("pre_probe", scan_of(v_probe), state),
        ("no_newton", scan_of(step0), st_nolag),
        ("full_lag", scan_of(step_full), state),
        ("full_plain", scan_of(step_plain), st_nolag),
    ]
    for name, runner, s in variants:
        ms = timeit(runner, s)
        kc = kcount(runner, s)
        results[name] = {"ms_per_step": round(ms, 3), "fusions": kc}
        print(f"{name:12s} {ms:8.3f} ms/step   fusions={kc}",
              file=sys.stderr, flush=True)

    out = {"device": f"{dev.platform}:{dev.device_kind}",
           "n_nodes": int(mesh.n_nodes), "variants": results}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "PROFILE_inscan.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"profile": path}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

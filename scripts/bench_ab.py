"""Same-session bench repeat-spread measurement (VERDICT r4 weak #8 /
item 9): adjudicate the r3 -> r4 bench tick-up (5.94 -> 6.13 ms/step,
BENCH_r03/r04.json).

Structural proof first: between the r3 and r4 snapshots (efbb9c4 ->
ff99846) the ONLY file on any bench-path import that changed is
api/run.py (+ a 6-line api/model.py attribute default that does not
enter freeze()) — and bench.py does not go through api/run.py: it calls
make_step_fn/run_window directly.  timestep.py, newton.py, krylov.py,
precond.py, physics/, fem/, mesh/ and bench.py itself are bit-identical
across the rounds, so the compiled XLA program is the same program.  A
"configuration A/B" therefore cannot distinguish anything; the only
open question is whether the documented tunnel session variance
(CLAUDE.md: 17.2 / 14.9 / 18.6 ms on identical code) covers the 0.19 ms
delta.  This script measures that variance IN ONE SESSION: it runs the
exact bench timing loop (same model, same grouped-dispatch program) as
repeated passes in a single process and reports the pass-to-pass
spread.  If max-min across passes >= 0.19 ms, the r3->r4 tick-up is
inside same-session noise — let alone cross-session noise, which the
three historical numbers above bound at +-1.9 ms.

Writes scripts/BENCH_AB.json.  Usage (on TPU):

    python scripts/bench_ab.py [n_passes]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from shakti_tpu.utils.backend import ensure_backend  # noqa: E402

ensure_backend()

import numpy as np  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "BENCH_AB.json")


def main():
    import jax
    import jax.numpy as jnp

    from shakti_tpu.solve.timestep import (make_step_fn, run_window,
                                           timestep_sizes)

    n_passes = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    # enough horizon for warmup + n_passes x 2 groups of 25 windows
    os.environ.setdefault("SHAKTI_BENCH_DAYS", str((n_passes * 2 + 2) * 25))
    from bench import BASELINE_MS_PER_STEP, build_bench_model

    dev = jax.devices()[0]
    if dev.platform != "tpu":
        print(json.dumps({"error": f"no TPU (got {dev.platform})"}))
        return 9
    jax.block_until_ready(jnp.ones(8).sum())

    md = build_bench_model()
    mesh, static, state, cfg = md.freeze()
    step = make_step_fn(mesh, static, md.params, cfg)
    dts = timestep_sizes(md.timesteps, dtype=md.dtype)
    win = int(md.nt_save)
    group = 25

    pack = jax.jit(lambda s: jnp.concatenate(
        [s.N, s.b, s.q[:, 0], s.q[:, 1]]))

    def gbody(s, d):
        s, diag = run_window(step, s, d)
        extra = jnp.stack([diag["converged"].all().astype(s.N.dtype),
                           diag["newton_iters"].sum().astype(s.N.dtype),
                           diag["cg_iters"].sum().astype(s.N.dtype)])
        return s, jnp.concatenate([pack(s), extra])

    grouped = jax.jit(lambda s, d: jax.lax.scan(gbody, s, d))

    i = 0

    def run_group():
        nonlocal i, state
        state, rows = grouped(state, dts[i:i + group * win]
                              .reshape(group, win))
        flat = np.asarray(rows)          # the production-style packed pull
        i += group * win
        return flat

    run_group()                          # warmup: compile + settle
    run_group()
    passes = []
    while len(passes) < n_passes and i + 2 * group * win <= dts.shape[0]:
        t0 = time.time()
        f1 = run_group()
        f2 = run_group()
        ms = (time.time() - t0) / (2 * group * win) * 1e3
        conv = bool((f1[:, -3] > 0).all() and (f2[:, -3] > 0).all())
        passes.append({"ms_per_step": round(ms, 4), "converged": conv})
        print(f"pass {len(passes)}: {ms:.4f} ms/step conv={conv}",
              file=sys.stderr, flush=True)
    vals = np.array([p["ms_per_step"] for p in passes])
    res = {
        "device": f"{dev.platform}:{dev.device_kind}",
        "steps_per_pass": 2 * group * win,
        "passes": passes,
        "mean_ms": round(float(vals.mean()), 4),
        "spread_ms": round(float(vals.max() - vals.min()), 4),
        "r3_r4_delta_ms": 0.19,
        "delta_inside_spread": bool(vals.max() - vals.min() >= 0.19),
        "vs_baseline_mean": round(BASELINE_MS_PER_STEP / float(vals.mean()),
                                  3),
        "note": "bench program bit-identical r3<->r4 (git diff "
                "efbb9c4..ff99846 touches no bench-path module); this "
                "measures the session noise floor on the same program",
    }
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps({k: res[k] for k in
                      ("mean_ms", "spread_ms", "delta_inside_spread")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Gradient-based calibration of meltwater forcing — differentiable
simulation demo (solve/implicit.py).

Inverts the surface-melt forcing amplitude from 'observed' effective
pressures by descending the exact adjoint gradient through a multi-step
transient: every implicit Newton solve in the scan is differentiated via
the implicit-function theorem (one adjoint CG per step on the backward
pass), something the reference's PETSc stack cannot do at all.

Twin experiment: run the slab transient at a hidden true forcing scale
s* to produce observations, then recover s* from a wrong initial guess by
secant iteration on the adjoint gradient of  L(s) = ||N_T(s) - N_obs||^2.

    python examples/calibrate_melt.py        (~2 min, CPU)
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import setups.setup_slab as slab
from shakti_tpu.solve.timestep import (make_step_fn, run_window,
                                       timestep_sizes)


def build():
    md = slab.initialize(nx=16, ny=16, days=1.0, nt_per_day=16)
    md.b_init = np.full(md.x.size, 0.01)
    md.solver = dataclasses.replace(md.solver, adaptive_dt_levels=0,
                                    lag_operator=False, differentiable=True)
    mesh, static, state, cfg = md.freeze()
    step = make_step_fn(mesh, static, md.params, cfg)
    # rematerialize each step on the backward pass: O(1) stored states
    # per step instead of the full Newton byproducts (long horizons)
    step = jax.checkpoint(step)
    dts = timestep_sizes(md.timesteps, dtype=md.dtype)
    return md, state, step, dts


def main():
    md, state, step, dts = build()
    s_true = 1.7

    @jax.jit
    def final_N(scale):
        forcing = {"dt": dts, "inputs_scale": jnp.full_like(dts, scale)}
        out, _ = run_window(step, state, forcing)
        return out.N

    N_obs = final_N(jnp.asarray(s_true, md.dtype))

    @jax.jit
    def loss(s):
        dN = (final_N(s) - N_obs) / 1e5
        return jnp.mean(dN * dN)

    grad = jax.jit(jax.grad(loss))

    # 1-D smooth least squares: secant iteration on the adjoint gradient
    # (optimality condition g(s) = 0) converges superlinearly — for
    # field-valued controls swap in optax.adam on the same `grad`
    s_prev, g_prev = 1.0, float(grad(jnp.asarray(1.0, md.dtype)))
    s = 1.2
    print(f"# true scale {s_true}, initial guess {s_prev}")
    for it in range(15):
        g = float(grad(jnp.asarray(s, md.dtype)))
        print(f"iter {it:3d}  s = {s:.8f}  loss = {float(loss(s)):.3e}  "
              f"grad = {g:+.3e}", flush=True)
        if g == g_prev or abs(g) < 1e-14:
            break
        s_next = s - g * (s - s_prev) / (g - g_prev)
        s_prev, g_prev, s = s, g, s_next
    err = abs(s - s_true) / s_true
    print(f"# recovered s = {s:.8f} (relative error {err:.2e})")
    assert err < 1e-3, "calibration failed to recover the true forcing"
    print("calibration OK")


if __name__ == "__main__":
    main()

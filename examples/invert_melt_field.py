"""Inversion of a spatially distributed meltwater-input FIELD —
field-valued differentiable simulation (solve/implicit.py).

Where examples/calibrate_melt.py recovers one scalar, this recovers a
whole nodal field: the unknown spatial pattern of basal recharge is
inferred from effective-pressure observations by Adam (optax) on the
exact adjoint gradient of a regularized least-squares misfit.  Every
implicit Newton solve in the transient is differentiated through the
implicit-function theorem (one adjoint CG per step on the backward
pass); the control has one degree of freedom PER MESH NODE, which is
exactly the regime where adjoint gradients are the only viable option
(finite differences would cost n_nodes forward runs per iteration).
The reference's PETSc stack has no equivalent capability.

Twin experiment: a hidden recharge field r*(x) = r0 * exp(theta*(x))
with a Gaussian bump drives the slab transient to produce observations
N_obs; starting from the uniform field (theta = 0), Adam on

    L(theta) = mean(((N_T(theta) - N_obs) / 1e4)^2)
             + alpha * mean(area * |grad theta|^2)        (smoothness)

recovers the bump.  The exp parameterization keeps the field positive;
the Tikhonov term supplies smoothness where the data are weakly
informative (near the outflow boundary the pressure is pinned by the
Dirichlet condition and carries little information about recharge).

    python examples/invert_melt_field.py        (~3 min, CPU)
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
from shakti_tpu.fem import ops
from shakti_tpu.solve.timestep import make_runner, timestep_sizes

R0 = 1e-7          # background recharge [m/s]
ALPHA = 1e-3       # smoothness weight
LX = LY = 10e3


def build():
    md = slab.initialize(nx=20, ny=20, lx=LX, ly=LY, moulin_Q=0.0,
                         days=0.5, nt_per_day=24)
    md.b_init = np.full(md.x.size, 0.01)
    md.inputs = np.zeros(md.x.size)          # control supplies all recharge
    md.solver = dataclasses.replace(md.solver, adaptive_dt_levels=0,
                                    lag_operator=False, differentiable=True)
    mesh, static, state, cfg = md.freeze()
    runner = make_runner(md.params, cfg)
    dts = timestep_sizes(md.timesteps, dtype=md.dtype)
    return md, mesh, static, state, runner, dts


def true_theta(md):
    """Hidden log-recharge pattern: a smooth bump upslope of the center."""
    cx, cy, sig = 0.62 * LX, 0.5 * LY, 0.12 * LX
    r2 = (md.x - cx) ** 2 + (md.y - cy) ** 2
    return np.log1p(2.0 * np.exp(-r2 / (2.0 * sig ** 2)))


def main():
    md, mesh, static, state, runner, dts = build()
    theta_star = jnp.asarray(true_theta(md), md.dtype)

    def final_N(theta):
        st = dataclasses.replace(static, inputs=R0 * jnp.exp(theta))
        out, _ = runner(mesh, st, state, dts)
        return out.N

    N_obs = jax.jit(final_N)(theta_star)

    @jax.jit
    def loss(theta):
        dN = (final_N(theta) - N_obs) / 1e4
        g = ops.cell_grad(mesh, theta)                       # (c, 2)
        smooth = jnp.mean(mesh.area * jnp.sum(g * g, axis=-1))
        return jnp.mean(dN * dN) + ALPHA * smooth

    import optax
    opt = optax.adam(learning_rate=0.3)
    theta = jnp.zeros_like(theta_star)
    opt_state = opt.init(theta)

    @jax.jit
    def update(theta, opt_state):
        val, g = jax.value_and_grad(loss)(theta)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(theta, upd), opt_state, val

    err0 = float(jnp.linalg.norm(theta - theta_star)
                 / jnp.linalg.norm(theta_star))
    print(f"# {theta.size}-dof field inversion, initial rel error {err0:.3f}")
    for it in range(240):
        theta, opt_state, val = update(theta, opt_state)
        if it % 40 == 0 or it == 239:
            err = float(jnp.linalg.norm(theta - theta_star)
                        / jnp.linalg.norm(theta_star))
            print(f"iter {it:4d}  loss = {float(val):.3e}  "
                  f"field rel error = {err:.3f}", flush=True)
    err = float(jnp.linalg.norm(theta - theta_star)
                / jnp.linalg.norm(theta_star))
    print(f"# recovered {theta.size}-dof field: relative L2 error {err:.3f} "
          f"(from {err0:.3f} at the uniform start)")
    assert err < 0.30 * err0, "inversion failed to reduce the field error"
    print("field inversion OK")


if __name__ == "__main__":
    main()

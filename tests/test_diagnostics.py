"""Global mass conservation of the discretization (SURVEY §5 'mass balance'
observability row): boundary discharge from constrained-node residuals must
equal the independently integrated interior water production at steady
state."""

import jax
import jax.numpy as jnp
import numpy as np

import setups.setup_slab as slab
from shakti_tpu.solve import diagnostics as diag
from shakti_tpu.solve.timestep import make_step_fn, run_window


def run_to_steady(md, n_steps=400, dt=3600.0):
    mesh, static, state, cfg = md.freeze()
    step = make_step_fn(mesh, static, md.params, cfg)
    dts = jnp.full(n_steps, dt, md.dtype)
    state, d = jax.jit(lambda s, x: run_window(step, s, x))(state, dts)
    assert bool(np.asarray(d["converged"]).all())
    return mesh, static, state


def test_mass_balance_with_moulin():
    Q = 0.5
    md = slab.initialize(nx=16, ny=16, days=30.0, nt_per_day=1,
                         moulin_Q=Q)
    mesh, static, state = run_to_steady(md)
    out = diag.boundary_discharge(mesh, static, state, md.params)
    prod = diag.water_production(mesh, static, state, md.params)
    # discretization-level conservation
    assert abs(out - prod) / abs(prod) < 0.01, (out, prod)
    # and the moulin dominates the budget on this configuration
    assert 0.5 * Q < out < 2.0 * Q, out


def test_mass_balance_melt_only():
    md = slab.initialize(nx=16, ny=16, days=30.0, nt_per_day=1, moulin_Q=0.0)
    mesh, static, state = run_to_steady(md)
    out = diag.boundary_discharge(mesh, static, state, md.params)
    prod = diag.water_production(mesh, static, state, md.params)
    assert abs(out - prod) / max(abs(prod), 1e-12) < 0.01, (out, prod)
    assert out > 0.0   # geothermal melt drives net outflow


def test_certified_budget_closes_valley_balance():
    """The naive reaction identity is polluted on the capped-gap SHMIP
    valley (the transient leaves N converged against the PRE-update
    explicit fields); certified_budget's frozen-field re-solve must close
    the budget to solver precision (measured 1.6e-3 naive -> 5e-13
    certified on this configuration)."""
    import setups.setup_shmip as shmip
    from shakti_tpu.solve.timestep import timestep_sizes

    md = shmip.initialize("E1", days=20.0, nt_per_day=12, resolution=200.0)
    mesh, static, state, cfg = md.freeze()
    step = make_step_fn(mesh, static, md.params, cfg)
    dts = timestep_sizes(md.timesteps, dtype=md.dtype)
    state, d = jax.jit(lambda s, x: run_window(step, s, x))(state, dts)
    assert bool(np.asarray(d["converged"]).all())
    out, prod, info = diag.certified_budget(mesh, static, state, md.params,
                                            cfg)
    assert info["converged"]
    assert prod > 0.0
    assert abs(out - prod) / abs(prod) < 1e-8, (out, prod)

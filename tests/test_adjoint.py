"""Differentiable-simulation tests (solve/implicit.py): the IFT custom VJP
must (a) leave forward trajectories bit-identical, (b) produce gradients
matching central finite differences through multi-step transients, for both
per-step forcing parameters and initial-state fields.  A capability test —
the reference stack (PETSc NewtonSolver, reference solvers.py:51-63) has no
adjoint at all."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import setups.setup_slab as slab
from shakti_tpu.solve.timestep import make_step_fn, run_window, timestep_sizes


def _md(nx=12, ny=12, steps=5, **solver_kw):
    md = slab.initialize(nx=nx, ny=ny, days=steps / 24.0, nt_per_day=24)
    md.b_init = np.full(md.x.size, 0.01)
    kw = dict(adaptive_dt_levels=0, lag_operator=False,
              # tight solves so the IFT premise F(N*)=0 holds to roundoff
              # and the FD comparison is not polluted by solver tolerance
              rtol=1e-12, atol=1e-13, lin_rtol=1e-12)
    kw.update(solver_kw)
    md.solver = dataclasses.replace(md.solver, **kw)
    return md


def _window(md):
    mesh, static, state, cfg = md.freeze()
    step = make_step_fn(mesh, static, md.params, cfg)
    dts = timestep_sizes(md.timesteps, dtype=md.dtype)
    return mesh, state, step, dts


def test_forward_trajectory_unchanged():
    """differentiable=True must not perturb the primal computation."""
    md1 = _md()
    mesh, s1, step1, dts = _window(md1)
    out1, d1 = jax.jit(lambda s, d: run_window(step1, s, d))(s1, dts)

    md2 = _md(differentiable=True)
    _, s2, step2, _ = _window(md2)
    out2, d2 = jax.jit(lambda s, d: run_window(step2, s, d))(s2, dts)

    assert bool(np.asarray(d1["converged"]).all())
    assert bool(np.asarray(d2["converged"]).all())
    np.testing.assert_array_equal(np.asarray(out1.N), np.asarray(out2.N))
    np.testing.assert_array_equal(np.asarray(out1.b), np.asarray(out2.b))


def test_gradient_wrt_forcing_scale_matches_fd():
    """d(mean final N)/d(inputs_scale) through a 5-step transient: the
    gradient must flow through every implicit solve in the scan."""
    md = _md(differentiable=True)
    mesh, state, step, dts = _window(md)

    @jax.jit
    def loss(scale):
        forcing = {"dt": dts, "inputs_scale": jnp.full_like(dts, scale)}
        out, _ = run_window(step, state, forcing)
        return jnp.mean(out.N)

    s0 = jnp.asarray(1.0, md.dtype)
    g = float(jax.grad(loss)(s0))
    h = 1e-5
    fd = float((loss(s0 + h) - loss(s0 - h)) / (2 * h))
    assert fd != 0.0
    assert abs(g - fd) <= 2e-5 * abs(fd), (g, fd)


def test_gradient_wrt_initial_gap_matches_fd():
    """Directional derivative of the final state w.r.t. the initial gap
    height b0 (the state-to-state adjoint chain: b0 -> pre -> N* -> b1 ...)."""
    md = _md(differentiable=True)
    mesh, state, step, dts = _window(md)
    rng = np.random.default_rng(3)
    v = rng.normal(size=state.b.shape)
    v = jnp.asarray(v / np.linalg.norm(v), md.dtype)

    @jax.jit
    def loss_from_b(b0):
        out, _ = run_window(step, dataclasses.replace(state, b=b0), dts)
        return jnp.mean(out.N) / 1e5 + 1e3 * jnp.mean(out.b)

    g = jax.grad(loss_from_b)(state.b)
    gdir = float(jnp.vdot(g, v))
    h = 1e-6
    fd = float((loss_from_b(state.b + h * v)
                - loss_from_b(state.b - h * v)) / (2 * h))
    assert fd != 0.0
    assert abs(gdir - fd) <= 1e-4 * abs(fd), (gdir, fd)


def test_initial_iterate_gets_zero_cotangent():
    """The converged solution must not differentiate through the Newton
    starting iterate (the IFT premise) — grad w.r.t. N_init is exactly 0
    when the loss depends only on the solved N of the same step."""
    md = _md(steps=2, differentiable=True)
    mesh, state, step, dts = _window(md)

    @jax.jit
    def loss(N0):
        # N0 enters ONLY as N_prev (the extrapolation seed), not as the
        # storage-term N_n (storage is off in the slab case)
        out, _ = run_window(step, dataclasses.replace(state, N_prev=N0),
                            dts[:1])
        return jnp.mean(out.N)

    g = np.asarray(jax.grad(loss)(state.N * 1.01))
    np.testing.assert_array_equal(g, np.zeros_like(g))


def test_distributed_adjoint_matches_single_device_and_fd():
    """The IFT adjoint inside shard_map on the node-sharded halo path
    (solve/implicit.py distributed adaptations): d(mean final N)/d(scale)
    through a 5-step transient on 8 simulated devices must match both the
    single-device adjoint and central finite differences — the cotangent
    halo-accumulate, ghost-masked adjoint Krylov reductions, and
    owned-row residual masking are all load-bearing here."""
    from shakti_tpu.parallel.dist import make_distributed_runner
    from shakti_tpu.parallel.shard import make_device_mesh

    md = _md(differentiable=True)
    mesh, state, step, dts = _window(md)
    n = mesh.n_nodes

    @jax.jit
    def loss_single(scale):
        forcing = {"dt": dts, "inputs_scale": jnp.full_like(dts, scale)}
        out, _ = run_window(step, state, forcing)
        return jnp.mean(out.N)

    runner, state0, plan = make_distributed_runner(
        _md(differentiable=True), make_device_mesh())
    owned = jnp.asarray(plan["owned_mask"].reshape(-1), md.dtype)

    @jax.jit
    def loss_dist(scale):
        forcing = {"dt": dts, "inputs_scale": jnp.full_like(dts, scale)}
        out, _ = runner(state0, forcing)
        return jnp.vdot(out.N * owned, owned) / n     # mean over owned rows

    s0 = jnp.asarray(1.0, md.dtype)
    # forward parity first (the usual dist-vs-single contract)
    np.testing.assert_allclose(float(loss_dist(s0)), float(loss_single(s0)),
                               rtol=1e-10)
    g1 = float(jax.grad(loss_single)(s0))
    g8 = float(jax.grad(loss_dist)(s0))
    assert abs(g8 - g1) <= 1e-6 * abs(g1), (g8, g1)
    h = 1e-5
    fd = float((loss_dist(s0 + h) - loss_dist(s0 - h)) / (2 * h))
    assert fd != 0.0
    assert abs(g8 - fd) <= 2e-5 * abs(fd), (g8, fd)


def test_gradient_wrt_spatial_inputs_field_matches_fd():
    """Field-valued control: d loss / d inputs(x) — the spatially
    distributed meltwater field enters through StaticFields, so the
    inversion workflow routes static through make_runner as a traced jit
    argument (examples/invert_melt_field.py).  Directional derivative vs
    central FD through a 5-step transient."""
    from shakti_tpu.solve.timestep import make_runner

    md = _md(differentiable=True)
    mesh, static, state, cfg = md.freeze()
    runner = make_runner(md.params, cfg)
    dts = timestep_sizes(md.timesteps, dtype=md.dtype)
    # add a distributed background recharge so the control is non-degenerate
    # away from the single moulin node
    base = static.inputs + jnp.asarray(1e-7, md.dtype)
    rng = np.random.default_rng(7)
    v = rng.normal(size=np.asarray(base).shape)
    v = jnp.asarray(v / np.linalg.norm(v), md.dtype)

    @jax.jit
    def loss(inputs):
        st = dataclasses.replace(static, inputs=inputs)
        out, _ = runner(mesh, st, state, dts)
        return jnp.mean(out.N) / 1e5

    g = jax.grad(loss)(base)
    gdir = float(jnp.vdot(g, v))
    h = 1e-6 * float(jnp.linalg.norm(base))
    fd = float((loss(base + h * v) - loss(base - h * v)) / (2 * h))
    assert fd != 0.0
    assert abs(gdir - fd) <= 1e-4 * abs(fd), (gdir, fd)


def test_distributed_field_gradient_matches_single_device():
    """DISTRIBUTED field-valued control (the production inversion path):
    d loss / d inputs(x) with the recharge field exposed as a runtime
    argument of the halo runner (make_distributed_runner control="inputs").
    The global->stacked localization is a jnp gather whose AD transpose
    must scatter-add ghost-slot cotangents back into their global dofs;
    the full (n,) gradient must match the single-device adjoint and a
    directional FD probe."""
    from shakti_tpu.parallel.dist import make_distributed_runner
    from shakti_tpu.parallel.shard import make_device_mesh
    from shakti_tpu.solve.timestep import make_runner

    md = _md(differentiable=True)
    mesh, static, state, cfg = md.freeze()
    runner1 = make_runner(md.params, cfg)
    dts = timestep_sizes(md.timesteps, dtype=md.dtype)
    n = mesh.n_nodes
    base = static.inputs + jnp.asarray(1e-7, md.dtype)

    @jax.jit
    def loss_single(inputs):
        st = dataclasses.replace(static, inputs=inputs)
        out, _ = runner1(mesh, st, state, dts)
        return jnp.mean(out.N) / 1e5

    runner8, state0, plan = make_distributed_runner(
        _md(differentiable=True), make_device_mesh(), control="inputs")
    gid = jnp.asarray(plan["glob_ids"].reshape(-1))
    live = jnp.asarray(plan["live_mask"].reshape(-1), md.dtype)
    owned = jnp.asarray(plan["owned_mask"].reshape(-1), md.dtype)

    @jax.jit
    def loss_dist(inputs):
        stacked = inputs[gid] * live
        out, _ = runner8(stacked, state0, dts)
        return jnp.vdot(out.N * owned, owned) / n / 1e5

    np.testing.assert_allclose(float(loss_dist(base)),
                               float(loss_single(base)), rtol=1e-10)
    g1 = np.asarray(jax.grad(loss_single)(base))
    g8 = np.asarray(jax.grad(loss_dist)(base))
    np.testing.assert_allclose(g8, g1, rtol=1e-7, atol=1e-7 * np.abs(g1).max())
    # directional FD probe on the distributed loss
    rng = np.random.default_rng(11)
    v = rng.normal(size=g8.shape)
    v = jnp.asarray(v / np.linalg.norm(v), md.dtype)
    h = 1e-6 * float(jnp.linalg.norm(base))
    fd = float((loss_dist(base + h * v) - loss_dist(base - h * v)) / (2 * h))
    gdir = float(jnp.vdot(jnp.asarray(g8), v))
    assert fd != 0.0
    assert abs(gdir - fd) <= 1e-4 * abs(fd), (gdir, fd)


def test_strict_mode_poisons_unconverged_adjoint(monkeypatch):
    """SHAKTI_ADJOINT_STRICT=1: an adjoint Krylov solve that cannot
    converge (lin_maxiter=1) must poison the gradient with NaN — loud
    failure instead of a silently inaccurate gradient.  The forward
    trajectory is untouched (the cap only binds the backward solve here:
    forward Newton still certifies via its own stats)."""
    def grad_with(strict: bool):
        if strict:
            monkeypatch.setenv("SHAKTI_ADJOINT_STRICT", "1")
        else:
            monkeypatch.delenv("SHAKTI_ADJOINT_STRICT", raising=False)
        md = _md(steps=2, differentiable=True, lin_maxiter=1, max_iter=60,
                 lin_rtol=1e-12)
        mesh, state, step, dts = _window(md)

        @jax.jit
        def loss(b0):
            out, _ = run_window(step, dataclasses.replace(state, b=b0),
                                dts[:1])
            return jnp.mean(out.N)

        return np.asarray(jax.grad(loss)(state.b))

    # default mode: the (inaccurate) gradient flows through finite
    g_loose = grad_with(False)
    assert np.isfinite(g_loose).all()
    g = grad_with(True)
    assert np.isnan(g).all(), "strict mode did not poison the gradient"


def test_lag_operator_rejected():
    md = _md(differentiable=True, lag_operator=True)
    mesh, static, state, cfg = md.freeze()
    from shakti_tpu.solve.timestep import make_step_fn as msf
    with pytest.raises(ValueError, match="differentiable"):
        msf(mesh, static, md.params, cfg)

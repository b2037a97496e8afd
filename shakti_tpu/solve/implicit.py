"""Differentiable implicit solves: reverse-mode AD through Newton via the
implicit-function theorem (a capability the reference stack does not have —
PETSc's NewtonSolver, reference solvers.py:51-63, is not differentiable).

The framework's whole timestep is pure-functional jnp EXCEPT the implicit
N-solve, whose ``lax.while_loop`` Newton/Krylov iterations reverse-mode AD
cannot unroll.  Instead of unrolling, the converged solution is given its
exact mathematical derivative (custom VJP): with

    F(N*, pre) = 0        on free nodes,
    N*          = N_bdry  on Dirichlet nodes,

the implicit-function theorem gives, for a loss cotangent ``ct`` on N*,

    A^T lambda = ct|_free        (A = -J, the forward Krylov operator)
    ct_pre     = (dF/dpre)^T lambda

i.e. ONE adjoint Krylov solve per backward step — same matrix-free
element-block operator, symmetric Dirichlet elimination, and degenerate-row
diagonal floor as the forward iteration (solve/newton.py) — followed by one
VJP of the residual assembly with N held fixed.  The adjoint operator is
exact: the global Jacobian transpose assembles from the per-element
transposed blocks (J^T = sum_c S_c J_c^T S_c^T), so the small
dissipation-convection asymmetry of A is honored rather than ignored.

Gradients flow into everything ``pre`` depends on — the previous state
(b, q, melt, N_n), dt, and the per-step forcing (inputs scale, degree-day
melt) — so whole transients (``run_window`` scans) are differentiable
end-to-end for calibration/inversion workflows (examples/calibrate_melt.py).
Enable with ``NewtonConfig(differentiable=True)``; incompatible with
``lag_operator`` (stateful operator carry).

Distributed (node-sharded halo) adjoint: inside ``shard_map`` the same IFT
algebra runs on the owned/ghost representation with three adaptations —
(1) the incoming cotangent carries per-shard partial contributions at
owned AND ghost slots (every shard's cells read ghost copies of N*), so it
is halo-ACCUMULATED into the globally consistent cotangent before the
adjoint solve; (2) the adjoint Krylov uses the ghost-masked psum'd
dot/norm (like the forward solve); (3) the residual whose VJP produces
``ct_pre`` is masked to OWNED rows — ghost rows duplicate their owner's
equation across shards, and an unmasked VJP would count each interface
constraint once per replica.  The backward halo collectives are the AD
transposes XLA derives from the forward ``all_to_all`` pattern.  Verified
against the single-device adjoint and finite differences on an 8-device
mesh (tests/test_adjoint.py).

Memory: reverse over a T-step ``lax.scan`` stores T forward states; wrap the
step in ``jax.checkpoint`` for long horizons (the example does).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import numpy as np

from shakti_tpu.physics import residual as res
from shakti_tpu.solve import krylov
from shakti_tpu.solve.precond import make_jacobi


def _zero_cotangent(x):
    """Zero cotangent for a custom_vjp primal leaf: zeros for inexact
    dtypes, float0 for integer/bool leaves (jax's convention)."""
    aval = jax.core.get_aval(x)
    if jnp.issubdtype(aval.dtype, jnp.inexact):
        return jnp.zeros(aval.shape, aval.dtype)
    return np.zeros(aval.shape, jax.dtypes.float0)


def make_implicit_solver(mesh, dirichlet, dirichlet_value, params, cfg):
    """Returns solve(N_init, N_ref, pre) -> (N, stats), a drop-in for the
    ``newton_solve`` call in solve/timestep.make_step_fn with an exact
    implicit-function-theorem VJP.

    ``N_init``/``N_ref`` receive zero cotangents: the converged solution
    does not depend on the starting iterate (their only role is iteration
    count), which is precisely what makes the IFT shortcut exact.

    Works on single-device meshes and, inside ``shard_map``, on
    node-sharded halo meshes (see module docstring for the three
    distributed adaptations).
    """
    from shakti_tpu.solve.newton import newton_solve

    distributed = mesh.halo is not None

    # mesh / dirichlet / dirichlet_value are explicit custom_vjp ARGUMENTS,
    # not closures: inside shard_map their leaves are tracers, and a
    # custom_vjp fwd/bwd pair must not close over tracers (they would be
    # staged as jaxpr constants — "No constant handler for
    # DynamicJaxprTracer" at lowering).  They ride through the residuals
    # and get zero/float0 cotangents.  cfg/params close fine (python
    # scalars, static).
    def _forward(N_init, N_ref, pre, mesh, dirichlet, dirichlet_value):
        return newton_solve(N_init, pre, mesh, dirichlet, dirichlet_value,
                            params, cfg, N_ref=N_ref)

    solve = jax.custom_vjp(_forward)

    def fwd(N_init, N_ref, pre, mesh, dirichlet, dirichlet_value):
        N, stats = _forward(N_init, N_ref, pre, mesh, dirichlet,
                            dirichlet_value)
        return (N, stats), (N, pre, mesh, dirichlet, dirichlet_value)

    def bwd(saved, ct):
        N, pre, mesh, dirichlet, dirichlet_value = saved
        if distributed:
            dot, norm = mesh.halo.dot, mesh.halo.norm
            owned = mesh.halo.owned_mask
        else:
            dot, norm, owned = jnp.vdot, jnp.linalg.norm, None
        ct_N = ct[0]                      # ct[1] = stats cotangents (float0)
        if owned is not None:
            # distributed: the cotangent arrives as per-shard PARTIAL
            # contributions (owned + ghost slots); sum ghost contributions
            # into their owners and refresh ghosts -> the globally
            # consistent cotangent in the owned/ghost representation
            ct_N = mesh.halo.accumulate(ct_N)
        # exact adjoint operator: transpose the element Jacobian blocks
        # (global J^T = sum_c S_c J_c^T S_c^T), same symmetric elimination
        # and degenerate-row floor as the forward solve (newton.py)
        J_c = res.element_jacobian(N, pre, mesh, params)
        A_t0 = res.make_matvec(jnp.swapaxes(J_c, 1, 2), mesh, dirichlet)
        a_diag = -res.jacobian_diag(J_c, mesh)        # diag(A), transpose-inv
        dmax = jnp.max(jnp.where(dirichlet, 0.0, jnp.abs(a_diag)))
        if owned is not None:
            # SPMD consistency: same floor scale on every shard (newton.py)
            dmax = jax.lax.pmax(dmax, mesh.halo.axis)
        extra = jnp.where(
            dirichlet, 0.0,
            jnp.maximum(0.0, cfg.diag_floor_rel * dmax - a_diag))
        A_t = lambda x: A_t0(x) + extra * x
        a_diag = a_diag + extra
        tiny = jnp.asarray(jnp.finfo(N.dtype).tiny, N.dtype)
        minv = make_jacobi(a_diag, dirichlet, tiny)

        rhs = jnp.where(dirichlet, 0.0, ct_N)
        lin_solve = krylov.get_solver(cfg.krylov)
        lam, _info = lin_solve(A_t, rhs, minv=minv, rtol=cfg.lin_rtol,
                               maxiter=cfg.lin_maxiter, dot=dot, norm=norm)
        # A^T lambda = ct  =>  ct_pre = (dF/dpre)^T lambda  (see module doc;
        # lambda vanishes on Dirichlet rows because A acts as identity there
        # and rhs is masked, so the row masking of F is immaterial).
        # Distributed: mask to OWNED rows — every ghost row duplicates its
        # owner's equation on another shard, and the VJP sums over all
        # slots of all shards, so unmasked ghost rows would count each
        # interface constraint once per replica.
        def masked_resid(pr):
            F = res.assemble_residual(N, pr, mesh, params)
            F = jnp.where(dirichlet, 0.0, F)
            return F if owned is None else F * owned

        _, vjp_pre = jax.vjp(masked_resid, pre)
        (ct_pre,) = vjp_pre(lam)
        zero = jnp.zeros_like(N)
        zeros = lambda t: jax.tree_util.tree_map(_zero_cotangent, t)
        return (zero, zero, ct_pre, zeros(mesh), _zero_cotangent(dirichlet),
                _zero_cotangent(dirichlet_value))

    solve.defvjp(fwd, bwd)
    return lambda N_init, N_ref, pre: solve(N_init, N_ref, pre, mesh,
                                            dirichlet, dirichlet_value)

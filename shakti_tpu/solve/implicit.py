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
``lag_operator`` (stateful operator carry) and the distributed halo path
(adjoint reductions not wired — single logical domain only).

Memory: reverse over a T-step ``lax.scan`` stores T forward states; wrap the
step in ``jax.checkpoint`` for long horizons (the example does).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from shakti_tpu.physics import residual as res
from shakti_tpu.solve import krylov
from shakti_tpu.solve.precond import make_jacobi


def make_implicit_solver(mesh, dirichlet, dirichlet_value, params, cfg):
    """Returns solve(N_init, N_ref, pre) -> (N, stats), a drop-in for the
    ``newton_solve`` call in solve/timestep.make_step_fn with an exact
    implicit-function-theorem VJP.

    ``N_init``/``N_ref`` receive zero cotangents: the converged solution
    does not depend on the starting iterate (their only role is iteration
    count), which is precisely what makes the IFT shortcut exact.
    """
    if mesh.halo is not None:
        raise ValueError("differentiable solve: distributed halo meshes are "
                         "not supported (use the single-device path)")
    from shakti_tpu.solve.newton import newton_solve

    def _forward(N_init, N_ref, pre):
        return newton_solve(N_init, pre, mesh, dirichlet, dirichlet_value,
                            params, cfg, N_ref=N_ref)

    @jax.custom_vjp
    def solve(N_init, N_ref, pre):
        return _forward(N_init, N_ref, pre)

    def fwd(N_init, N_ref, pre):
        N, stats = _forward(N_init, N_ref, pre)
        return (N, stats), (N, pre)

    def bwd(saved, ct):
        N, pre = saved
        ct_N = ct[0]                      # ct[1] = stats cotangents (float0)
        # exact adjoint operator: transpose the element Jacobian blocks
        # (global J^T = sum_c S_c J_c^T S_c^T), same symmetric elimination
        # and degenerate-row floor as the forward solve (newton.py)
        J_c = res.element_jacobian(N, pre, mesh, params)
        A_t0 = res.make_matvec(jnp.swapaxes(J_c, 1, 2), mesh, dirichlet)
        a_diag = -res.jacobian_diag(J_c, mesh)        # diag(A), transpose-inv
        dmax = jnp.max(jnp.where(dirichlet, 0.0, jnp.abs(a_diag)))
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
                               maxiter=cfg.lin_maxiter)
        # A^T lambda = ct  =>  ct_pre = (dF/dpre)^T lambda  (see module doc;
        # lambda vanishes on Dirichlet rows because A acts as identity there
        # and rhs is masked, so the row masking of F is immaterial)
        def masked_resid(pr):
            F = res.assemble_residual(N, pr, mesh, params)
            return jnp.where(dirichlet, 0.0, F)

        _, vjp_pre = jax.vjp(masked_resid, pre)
        (ct_pre,) = vjp_pre(lam)
        zero = jnp.zeros_like(N)
        return zero, zero, ct_pre

    solve.defvjp(fwd, bwd)
    return solve

"""Damped Newton solver for the nonlinear effective-pressure equation.

Replaces `dolfinx.nls.petsc.NewtonSolver` + `NonlinearProblem`
(reference solvers.py:51-54) with a jit-compiled Newton loop under
`lax.while_loop`:

  * residual/Jacobian from physics/residual.py (AD element blocks),
  * inner linear solve = matrix-free PCG/BiCGStab (solve/krylov.py),
  * DOLFINx-compatible convergence test: ||r|| < atol  or
    ||r|| <= rtol * ||r0||   (DOLFINx defaults rtol=1e-9, atol=1e-10,
    criterion "residual", relaxation 1.0 — mirrored in NewtonConfig),
  * divergence -> `converged=False` flag returned in-graph; the API layer
    raises, matching the reference's `assert (converged)`
    (reference solvers.py:179-180) but without crashing mid-scan.

Dirichlet conditions are enforced by projecting the initial guess onto the
boundary values and eliminating constrained rows/cols symmetrically
(physics/residual.make_matvec), which reproduces the reference's
dirichletbc/apply-lifting behavior after its first iteration.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from shakti_tpu.physics import residual as res
from shakti_tpu.solve import krylov


@dataclasses.dataclass(frozen=True)
class NewtonConfig:
    """Static (hashable) solver configuration."""

    rtol: float = 1e-9          # relative residual tolerance (DOLFINx default)
    atol: float = 1e-10         # absolute residual tolerance (DOLFINx default)
    max_iter: int = 50          # DOLFINx default max_it
    relaxation: float = 1.0     # update damping (DOLFINx relaxation_parameter)
    lin_rtol: float = 1e-8      # Krylov relative tolerance
    lin_maxiter: int = 2000     # Krylov iteration cap
    krylov: str = "cg"          # 'cg' or 'bicgstab'
    quad_degree: int = 4        # quadrature rule (see fem/p1.py)
    # Stagnation handling: when the residual stops improving (floating-point
    # floor reached — the dominant regime in f32), exit and accept the solve
    # if the residual fell by at least 1/stall_rtol relative to the start.
    # PETSc/DOLFINx have no analogue because f64 rarely floors; on TPU f32
    # this is what makes long transients robust (SURVEY §7 hard part 1).
    stall_rtol: float = 1e-6    # acceptance threshold on ||r||/||r0|| at stall
    stall_factor: float = 0.5   # 'no progress' = rnorm > factor * prev rnorm
    stall_patience: int = 2     # consecutive no-progress iterations to exit
    # Increment criterion: accept when the Newton update becomes negligible,
    # ||dN|| <= inc_rtol * ||N||.  The residual norm in f32 floors at
    # evaluation noise (eps * |N| propagated through the form) long before
    # the update stops improving N, so near steady state the increment is
    # the reliable signal (DOLFINx's 'incremental' criterion, made the
    # primary test for f32).  0 disables.
    inc_rtol: float = 0.0

    def for_dtype(self, dtype) -> "NewtonConfig":
        """Loosen tolerances to what the dtype can resolve (f32 on TPU)."""
        if jnp.dtype(dtype) == jnp.float32:
            return dataclasses.replace(
                self,
                rtol=max(self.rtol, 2e-5),
                atol=max(self.atol, 0.0),
                lin_rtol=max(self.lin_rtol, 1e-6),
                stall_rtol=max(self.stall_rtol, 3e-3),
                stall_patience=max(self.stall_patience, 3),
                inc_rtol=max(self.inc_rtol, 1e-6),
            )
        return self


def newton_solve(N_init, pre, mesh, dirichlet, dirichlet_value, params,
                 cfg: NewtonConfig):
    """Solve F(N) = 0 for effective pressure.

    Returns (N, stats) with stats = dict(iters, rnorm0, rnorm, converged,
    cg_iters).  Fully traceable; call under jit/scan.
    """
    lin_solve = krylov.get_solver(cfg.krylov)

    def resid(N):
        r = res.assemble_residual(N, pre, mesh, params)
        return jnp.where(dirichlet, 0.0, r)

    N0 = jnp.where(dirichlet, dirichlet_value, N_init)
    r0 = resid(N0)
    rnorm0 = jnp.linalg.norm(r0)
    tiny = jnp.asarray(jnp.finfo(N0.dtype).tiny, N0.dtype)
    # dtype-aware absolute floor: residuals below ~the roundoff of the
    # element contributions cannot be resolved, only chased
    floor = res.residual_roundoff_floor(N0, pre, mesh, params)
    atol_eff = jnp.maximum(jnp.asarray(cfg.atol, N0.dtype), 10.0 * floor)

    def converged_fn(rnorm):
        return (rnorm < atol_eff) | (rnorm <= cfg.rtol * jnp.maximum(rnorm0, tiny))

    def cond(s):
        N, r, rnorm, stall, k, cg_total, bad, done = s
        return ((~done) & (k < cfg.max_iter) & (~bad)
                & (stall < cfg.stall_patience))

    def body(s):
        N, r, rnorm, stall, k, cg_total, bad, done = s
        J_c = res.element_jacobian(N, pre, mesh, params)
        matvec, a_diag = res.make_operator(J_c, mesh, dirichlet)
        safe = jnp.where(jnp.abs(a_diag) < tiny, 1.0, a_diag)
        minv = jnp.where(dirichlet, 1.0, 1.0 / safe)
        rhs = r                                             # A dN = F (r == masked F)
        dN, lin_info = lin_solve(matvec, rhs, minv,
                                 rtol=cfg.lin_rtol, atol=0.1 * atol_eff,
                                 maxiter=cfg.lin_maxiter)
        N = N + cfg.relaxation * dN
        r = resid(N)
        rnorm_new = jnp.linalg.norm(r)
        bad = ~jnp.isfinite(rnorm_new)
        inc_ok = (cfg.inc_rtol > 0.0) & (
            jnp.linalg.norm(dN) <= cfg.inc_rtol * jnp.linalg.norm(N))
        done = converged_fn(rnorm_new) | inc_ok
        stall = jnp.where(rnorm_new > cfg.stall_factor * rnorm, stall + 1, 0)
        return (N, r, rnorm_new, stall, k + 1,
                cg_total + lin_info["iters"], bad, done)

    init = (N0, r0, rnorm0, 0, 0, 0, ~jnp.isfinite(rnorm0),
            converged_fn(rnorm0))
    N, r, rnorm, stall, k, cg_total, bad, done = jax.lax.while_loop(
        cond, body, init)
    # accept a stalled solve that still made a deep relative reduction — the
    # floating-point residual floor, not true divergence
    accepted = done | (rnorm <= cfg.stall_rtol * rnorm0)
    stats = {
        "iters": k,
        "rnorm0": rnorm0,
        "rnorm": rnorm,
        "converged": accepted & (~bad),
        "cg_iters": cg_total,
    }
    return N, stats

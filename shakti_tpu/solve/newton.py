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

    def for_dtype(self, dtype) -> "NewtonConfig":
        """Loosen tolerances to what the dtype can resolve (f32 on TPU)."""
        if jnp.dtype(dtype) == jnp.float32:
            return dataclasses.replace(
                self,
                rtol=max(self.rtol, 2e-5),
                atol=max(self.atol, 0.0),
                lin_rtol=max(self.lin_rtol, 1e-6),
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

    def converged_fn(rnorm):
        return (rnorm < cfg.atol) | (rnorm <= cfg.rtol * jnp.maximum(rnorm0, tiny))

    def cond(s):
        N, r, rnorm, k, cg_total, bad = s
        return (~converged_fn(rnorm)) & (k < cfg.max_iter) & (~bad)

    def body(s):
        N, r, rnorm, k, cg_total, bad = s
        J_c = res.element_jacobian(N, pre, mesh, params)
        a_diag = -res.jacobian_diag(J_c, mesh)              # diag of A = -J
        safe = jnp.where(jnp.abs(a_diag) < tiny, 1.0, a_diag)
        minv = jnp.where(dirichlet, 1.0, 1.0 / safe)
        matvec = res.make_matvec(J_c, mesh, dirichlet)
        rhs = r                                             # A dN = F (r == masked F)
        dN, lin_info = lin_solve(matvec, rhs, minv,
                                 rtol=cfg.lin_rtol, maxiter=cfg.lin_maxiter)
        N = N + cfg.relaxation * dN
        r = resid(N)
        rnorm_new = jnp.linalg.norm(r)
        bad = ~jnp.isfinite(rnorm_new)
        return (N, r, rnorm_new, k + 1, cg_total + lin_info["iters"], bad)

    init = (N0, r0, rnorm0, 0, 0, ~jnp.isfinite(rnorm0))
    N, r, rnorm, k, cg_total, bad = jax.lax.while_loop(cond, body, init)
    stats = {
        "iters": k,
        "rnorm0": rnorm0,
        "rnorm": rnorm,
        "converged": converged_fn(rnorm) & (~bad),
        "cg_iters": cg_total,
    }
    return N, stats

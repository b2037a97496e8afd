"""Preconditioners for the Newton linear solves.

The reference leans on PETSc's default KSP preconditioning (reference
solvers.py:51-54).  Here:

  * Jacobi (diagonal) — the baseline; handles the enormous local
    transmissivity contrast (|b|^3 spans ~4 decades after clamping).
  * Two-level additive (Jacobi + coarse-grid correction) — handles the
    global/smooth error modes Jacobi cannot: nodes are aggregated into
    contiguous blocks (the solver ordering is RCB-localized on TPU, so
    blocks are spatially compact), the Galerkin coarse operator
    A_c = P^T A P for piecewise-constant P is assembled from the element
    Jacobians with one segment-sum, Cholesky-factored once per Newton
    iteration, and applied per Krylov iteration with reshape-sum /
    repeat (no gather or scatter in the hot path).

At Cook_E2 scale this cuts PCG iterations ~3-4x and, more importantly,
makes the inexact-Newton steps accurate under rough-b conditioning
(SURVEY §7 hard part 3: 'better-than-Jacobi preconditioner' is required
beyond toy scales).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from shakti_tpu.fem.ops import ein


def make_jacobi(a_diag, dirichlet, tiny):
    safe = jnp.where(jnp.abs(a_diag) < tiny, 1.0, a_diag)
    minv = jnp.where(dirichlet, 1.0, 1.0 / safe)
    return lambda r: minv * r


def make_two_level(J_c, mesh, dirichlet, a_diag, block: int = 64):
    """Additive two-level preconditioner for A = -J.

    z = D^{-1} r + P (A_c^{-1} (P^T r)),  P = piecewise-constant over
    contiguous node blocks of ``block`` dofs.
    """
    n = mesh.n_nodes
    m = -(-n // block)
    pad = m * block - n
    dtype = a_diag.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    jacobi = make_jacobi(a_diag, dirichlet, tiny)

    # ---- coarse operator A_c = P^T (-J)|_free P  (one segment-sum) ----
    free = (~dirichlet).astype(dtype)
    wc = free[mesh.cells]                                    # (c, 3)
    w9 = wc[:, :, None] * wc[:, None, :]                     # (c, 3, 3)
    agg = mesh.cells // block                                # (c, 3) int
    map9 = (agg[:, :, None] * m + agg[:, None, :]).reshape(-1)
    flat = (-J_c * w9).reshape(-1)
    A_c = jax.ops.segment_sum(flat, map9, num_segments=m * m).reshape(m, m)
    # regularize empty / fully-constrained aggregates
    dmean = jnp.mean(jnp.abs(jnp.diag(A_c))) + tiny
    A_c = A_c + (1e-8 * dmean) * jnp.eye(m, dtype=dtype)
    # precompute the dense inverse: the per-Krylov-iteration apply is then a
    # single small matmul.  (cho_solve's triangular solves lower to many
    # sequential ops on TPU — measured slower per apply than inv()'s one-off
    # cost amortized over ~26 CG iterations.)
    A_inv = jnp.linalg.inv(A_c)

    def apply(r):
        rf = jnp.where(dirichlet, 0.0, r)
        rc = jnp.pad(rf, (0, pad)).reshape(m, block).sum(axis=1)
        zc = ein("ij,j->i", A_inv, rc)
        z_coarse = jnp.repeat(zc, block)[:n]
        z = jacobi(r) + jnp.where(dirichlet, 0.0, z_coarse)
        return z

    return apply


def make_preconditioner(name: str, J_c, mesh, dirichlet, a_diag,
                        coarse_block: int = 64):
    dtype = a_diag.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    if name == "two_level" and mesh.paxis is None and mesh.halo is None:
        return make_two_level(J_c, mesh, dirichlet, a_diag, coarse_block)
    return make_jacobi(a_diag, dirichlet, tiny)

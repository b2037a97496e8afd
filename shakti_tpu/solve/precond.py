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


def coarse_inverse(J_c, mesh, dirichlet, block: int = 64):
    """Dense inverse of the Galerkin coarse operator A_c = P^T (-J)|_free P
    for piecewise-constant P over contiguous ``block``-node aggregates
    (one segment-sum + one inv).  Split out of make_two_level so the
    lagged-operator path (solve/newton.py) can carry it across steps."""
    n = mesh.n_nodes
    m = -(-n // block)
    dtype = J_c.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    free = (~dirichlet).astype(dtype)
    wc = free[mesh.cells]                                    # (c, 3)
    w9 = wc[:, :, None] * wc[:, None, :]                     # (c, 3, 3)
    agg = mesh.cells // block                                # (c, 3) int
    map9 = (agg[:, :, None] * m + agg[:, None, :]).reshape(-1)
    flat = (-J_c * w9).reshape(-1)
    A_c = jax.ops.segment_sum(flat, map9, num_segments=m * m).reshape(m, m)
    return _regularized_inverse(A_c, m, dtype, tiny)


def _regularized_inverse(A_c, m, dtype, tiny):
    # regularize empty / fully-constrained aggregates
    dmean = jnp.mean(jnp.abs(jnp.diag(A_c))) + tiny
    A_c = A_c + (1e-8 * dmean) * jnp.eye(m, dtype=dtype)
    # precompute the dense inverse: the per-Krylov-iteration apply is then a
    # single small matmul.  (cho_solve's triangular solves lower to many
    # sequential ops on TPU — measured slower per apply than inv()'s one-off
    # cost amortized over ~26 CG iterations.)
    return jnp.linalg.inv(A_c)


def vals_coarse_ok(mesh, block: int) -> bool:
    """Can coarse_from_values replace the element-scatter Galerkin fold?

    Needs single-device row storage whose blocks tile the coarse
    aggregates exactly: scalar ELL always qualifies; BCSR/block-ELL when
    the aggregate size is a multiple of the storage block edge (whole
    blocks per aggregate) OR divides it (whole sub-tiles per block)."""
    if mesh.halo is not None or mesh.paxis is not None:
        return False
    # priority mirrors fold_operator_values (bcsr > bell > ell)
    if mesh.bcsr_brow is not None:
        B = int(mesh.bcsr_B)
        return block % B == 0 or B % block == 0
    if mesh.bell_nbr is not None:
        B = int(mesh.bell_B)
        return block % B == 0 or B % block == 0
    return mesh.ell_cols is not None


def coarse_from_values(vals, mesh, dirichlet, block: int = 64):
    """Galerkin coarse operator rebuilt from the FOLDED row-storage values
    instead of re-scattering the 9c element entries.

    Exactly the same sum as :func:`coarse_inverse` regrouped per stored
    nonzero: A_c[I,J] = sum of free-masked A entries with row agg I / col
    agg J, and the fold (physics/residual.fold_operator_values) already
    accumulated A = -J into row storage (padding slots are zero by
    construction in all three formats, so including them adds nothing).
    The element path's per-entry scatter serialized at ~7 ns/element on
    TPU (196 ms at 1M dof, scripts/ROOFLINE.json r4); here the mask
    contraction streams the values array contiguously and the scatter
    shrinks to one entry per stored block (nnzb ~ 273k at 1M dof).

    Bit-for-bit it differs from coarse_inverse only in float summation
    order (grouped per (row, col) entry before the aggregate sum)."""
    n = mesh.n_nodes
    m = -(-n // block)
    dtype = vals.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    free = (~dirichlet).astype(dtype)

    def block_tile(masked, rb, cb, B):
        """Aggregate sums + flat m*m keys for masked (K, B, B) blocks at
        block-row/col ids rb/cb.  block % B == 0: whole blocks per
        aggregate; B % block == 0: (sb, sb) sub-tiles per block (e.g. the
        bench-scale bell-128 mesh with 64-node aggregates).  Keys of
        fully-padded tiles (rows beyond n: free-mask zero) are clipped
        into range — they contribute exact zeros."""
        K = masked.shape[0]
        if block % B == 0:
            spb = block // B
            s = jnp.sum(masked, axis=(1, 2))                 # (K,)
            ar, ac = rb // spb, cb // spb
        else:
            sb = B // block
            s = jnp.sum(masked.reshape(K, sb, block, sb, block),
                        axis=(2, 4)).reshape(K * sb * sb)
            i = jnp.arange(sb, dtype=jnp.int32)
            ar = (rb[:, None, None] * sb + i[None, :, None])
            ac = (cb[:, None, None] * sb + i[None, None, :])
            ar = jnp.broadcast_to(ar, (K, sb, sb)).reshape(-1)
            ac = jnp.broadcast_to(ac, (K, sb, sb)).reshape(-1)
        key = jnp.minimum(ar, m - 1) * m + jnp.minimum(ac, m - 1)
        return jax.ops.segment_sum(s, key, num_segments=m * m)

    # format priority mirrors fold_operator_values (bcsr > bell > ell) so
    # the vals passed in are always interpreted in the format they were
    # folded into
    if mesh.bcsr_brow is not None:
        B = int(mesh.bcsr_B)
        NB = int(mesh.bcsr_NB)
        freep = jnp.pad(free, (0, NB * B - n)).reshape(NB, B)
        fr = freep[mesh.bcsr_brow]                           # (nnzb, B)
        fc = freep[mesh.bcsr_bcol]                           # (nnzb, B)
        # broadcast-sum, NOT einsum: tiny einsums lower to TPU convolution
        # kernels (CLAUDE.md r2 lesson)
        masked = vals * fr[:, :, None] * fc[:, None, :]
        A_c = block_tile(masked, mesh.bcsr_brow, mesh.bcsr_bcol, B)
    elif mesh.bell_nbr is not None:
        B = int(mesh.bell_B)
        NBb, KB = mesh.bell_nbr.shape
        freep = jnp.pad(free, (0, NBb * B - n)).reshape(NBb, B)
        fc = freep[mesh.bell_nbr]                            # (NB, KB, B)
        masked = (vals * freep[:, None, :, None]
                  * fc[:, :, None, :]).reshape(NBb * KB, B, B)
        rb = jnp.broadcast_to(jnp.arange(NBb, dtype=jnp.int32)[:, None],
                              (NBb, KB)).reshape(-1)
        A_c = block_tile(masked, rb, mesh.bell_nbr.reshape(-1), B)
    elif mesh.ell_cols is not None:
        fc = free[mesh.ell_cols]                             # (n, K)
        s = vals * free[:, None] * fc
        rowagg = (jnp.arange(mesh.ell_cols.shape[0],
                             dtype=jnp.int32)[:, None] // block)
        key = (rowagg * m + mesh.ell_cols // block).reshape(-1)
        A_c = jax.ops.segment_sum(s.reshape(-1), key, num_segments=m * m)
    else:
        raise ValueError("mesh has no row-storage operator structure")
    return _regularized_inverse(A_c.reshape(m, m), m, dtype, tiny)


def two_level_from_inverse(A_inv, a_diag, dirichlet, block: int, n: int):
    """Two-level apply z = D^{-1} r + P A_inv P^T r from a prebuilt coarse
    inverse (possibly carried from an earlier step)."""
    m = A_inv.shape[0]
    pad = m * block - n
    dtype = a_diag.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    jacobi = make_jacobi(a_diag, dirichlet, tiny)

    def apply(r):
        rf = jnp.where(dirichlet, 0.0, r)
        rc = jnp.pad(rf, (0, pad)).reshape(m, block).sum(axis=1)
        zc = ein("ij,j->i", A_inv, rc)
        z_coarse = jnp.repeat(zc, block)[:n]
        z = jacobi(r) + jnp.where(dirichlet, 0.0, z_coarse)
        return z

    return apply


def make_two_level(J_c, mesh, dirichlet, a_diag, block: int = 64,
                   vals=None):
    """Additive two-level preconditioner for A = -J.

    z = D^{-1} r + P (A_c^{-1} (P^T r)),  P = piecewise-constant over
    contiguous node blocks of ``block`` dofs.  When the caller already
    holds the folded row-storage ``vals`` the coarse operator is rebuilt
    from them (scatter-free) instead of re-scattering element entries.
    """
    if vals is not None and vals_coarse_ok(mesh, block):
        A_inv = coarse_from_values(vals, mesh, dirichlet, block)
    else:
        A_inv = coarse_inverse(J_c, mesh, dirichlet, block)
    return two_level_from_inverse(A_inv, a_diag, dirichlet, block,
                                  mesh.n_nodes)


def make_local_two_level(J_c, mesh, dirichlet, a_diag, block: int = 64):
    """Per-shard additive two-level for node-sharded SPMD (mesh.halo set).

    Each shard Galerkin-coarsens its OWN cells over contiguous local-node
    aggregates restricted to owned rows, dense-solves its local coarse
    problem, and pushes owner corrections to ghost copies so the
    preconditioned vector stays replication-consistent (one extra
    all_to_all per Krylov iteration).  Block-Jacobi across shards at the
    coarse level: boundary couplings owned by neighbor shards are dropped
    from the coarse operator — an approximation CG tolerates, and the
    difference to plain Jacobi is decisive at scale (smooth in-shard error
    modes are exactly what Jacobi cannot damp; only the P-dimensional
    cross-shard space is left untreated)."""
    halo = mesh.halo
    n = mesh.n_nodes                     # local slot count L
    m = -(-n // block)
    pad = m * block - n
    dtype = a_diag.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    jacobi = make_jacobi(a_diag, dirichlet, tiny)

    free = (~dirichlet).astype(dtype) * halo.owned_mask
    wc = free[mesh.cells]                                    # (c, 3)
    w9 = wc[:, :, None] * wc[:, None, :]                     # (c, 3, 3)
    agg = mesh.cells // block                                # (c, 3) int
    map9 = (agg[:, :, None] * m + agg[:, None, :]).reshape(-1)
    flat = (-J_c * w9).reshape(-1)
    A_c = jax.ops.segment_sum(flat, map9, num_segments=m * m).reshape(m, m)
    dmean = jnp.mean(jnp.abs(jnp.diag(A_c))) + tiny
    A_c = A_c + (1e-8 * dmean) * jnp.eye(m, dtype=dtype)
    A_inv = jnp.linalg.inv(A_c)

    def apply(r):
        rf = jnp.where(dirichlet, 0.0, r) * halo.owned_mask
        rc = jnp.pad(rf, (0, pad)).reshape(m, block).sum(axis=1)
        zc = ein("ij,j->i", A_inv, rc)
        z_coarse = jnp.repeat(zc, block)[:n] * halo.owned_mask
        z_coarse = halo.push(z_coarse)   # replication consistency
        return jacobi(r) + jnp.where(dirichlet, 0.0, z_coarse)

    return apply


def make_global_two_level(J_c, mesh, dirichlet, a_diag):
    """GLOBAL additive two-level for node-sharded SPMD (mesh.halo set,
    mesh.coarse_agg carrying global aggregate ids).

    Each shard assembles its own cells' contributions to the one global
    Galerkin coarse operator (cells are partitioned disjointly, so a psum
    completes the assembly exactly); the dense inverse is replicated.  The
    per-Krylov apply is one owned-masked restriction + an m-vector psum +
    a small matmul — and the prolonged correction is replication-
    consistent by construction (same global zc everywhere), needing no
    ghost push.  Strictly stronger than the per-shard block-diagonal
    coarse (make_local_two_level): cross-shard smooth error modes are in
    its range."""
    halo = mesh.halo
    agg = mesh.coarse_agg                       # (L,) int32 global agg ids
    m = mesh.coarse_m
    dtype = a_diag.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    jacobi = make_jacobi(a_diag, dirichlet, tiny)

    free = (~dirichlet).astype(dtype)
    wc = free[mesh.cells]                                    # (c, 3)
    w9 = wc[:, :, None] * wc[:, None, :]                     # (c, 3, 3)
    a3 = agg[mesh.cells]                                     # (c, 3)
    map9 = (a3[:, :, None] * m + a3[:, None, :]).reshape(-1)
    flat = (-J_c * w9).reshape(-1)
    A_c = jax.ops.segment_sum(flat, map9, num_segments=m * m)
    A_c = jax.lax.psum(A_c, halo.axis).reshape(m, m)
    dmean = jnp.mean(jnp.abs(jnp.diag(A_c))) + tiny
    A_c = A_c + (1e-8 * dmean) * jnp.eye(m, dtype=dtype)
    A_inv = jnp.linalg.inv(A_c)

    def apply(r):
        rf = jnp.where(dirichlet, 0.0, r) * halo.owned_mask
        rc = jax.ops.segment_sum(rf, agg, num_segments=m)
        rc = jax.lax.psum(rc, halo.axis)
        zc = ein("ij,j->i", A_inv, rc)
        return jacobi(r) + jnp.where(dirichlet, 0.0, zc[agg])

    return apply


def make_preconditioner(name: str, J_c, mesh, dirichlet, a_diag,
                        coarse_block: int = 64, *, matvec=None,
                        mg_omega: float = 0.8, mg_smoother: str = "jacobi",
                        mg_cheb_deg: int = 2, mg_cheb_frac: float = 0.25,
                        mg_cycle: str = "v", mg_smooth_p: float = 0.0,
                        vals=None):
    dtype = a_diag.dtype
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    if name == "mg" and mesh.paxis is None:
        # multilevel V-cycle (solve/mg.py): requires a host-built hierarchy
        # on the mesh and the exact fine operator for smoothing; falls back
        # to the two-level/jacobi ladder when either is missing (tiny
        # meshes degenerate to two_level anyway)
        if mesh.mg is not None and matvec is not None:
            from shakti_tpu.solve.mg import make_multilevel
            return make_multilevel(J_c, mesh, dirichlet, a_diag, matvec,
                                   omega=mg_omega, smoother=mg_smoother,
                                   cheb_deg=mg_cheb_deg,
                                   cheb_frac=mg_cheb_frac, cycle=mg_cycle,
                                   smooth_p=mg_smooth_p)
        name = "two_level"
    if name == "two_level" and mesh.paxis is None:
        if mesh.halo is not None:
            if mesh.coarse_agg is not None:
                return make_global_two_level(J_c, mesh, dirichlet, a_diag)
            # per-shard coarse only pays off with well-populated aggregates;
            # tiny shards (toy tests) fall back to jacobi
            if mesh.n_nodes >= 4 * coarse_block:
                return make_local_two_level(J_c, mesh, dirichlet, a_diag,
                                            coarse_block)
            return make_jacobi(a_diag, dirichlet, tiny)
        return make_two_level(J_c, mesh, dirichlet, a_diag, coarse_block,
                              vals=vals)
    return make_jacobi(a_diag, dirichlet, tiny)

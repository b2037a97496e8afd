"""Block-ELL operator: must match the scalar-ELL operator, and the
bell+reordered end-to-end solve must match the ell solve in user order."""

import jax
import jax.numpy as jnp
import numpy as np

from shakti_tpu.fem import bell as bellm
from shakti_tpu.fem import ell as ellm
from shakti_tpu.mesh.generate import rectangle_mesh
from shakti_tpu.mesh.mesh import build_mesh


def test_bell_matvec_matches_ell():
    nodes, cells = rectangle_mesh(9, 7, 1.0, 1.0, jitter=0.2, seed=13)
    n = nodes.shape[0]
    B = 16
    mesh = build_mesh(nodes, cells, dtype=jnp.float64, operator="both",
                      bell_block=B)
    rng = np.random.default_rng(5)
    J_c = jnp.asarray(rng.normal(size=(mesh.n_cells, 3, 3)))
    x = jnp.asarray(rng.normal(size=n))

    K = mesh.ell_cols.shape[1]
    y_ell = ellm.ell_matvec(ellm.ell_from_elements(J_c, mesh.ell_map, n, K),
                            mesh.ell_cols, x)

    NB, KB = mesh.bell_nbr.shape
    vals = bellm.bell_from_elements(J_c, mesh.bell_map, NB, KB, B)
    y_bell = bellm.bell_matvec(vals, mesh.bell_nbr, x, n)
    np.testing.assert_allclose(np.asarray(y_bell), np.asarray(y_ell),
                               rtol=1e-11, atol=1e-13)

    d_ell = ellm.ell_diag(ellm.ell_from_elements(J_c, mesh.ell_map, n, K),
                          mesh.ell_diag_slot)
    d_bell = bellm.bell_diag(vals, mesh.bell_diag_pos)
    np.testing.assert_allclose(np.asarray(d_bell), np.asarray(d_ell), rtol=1e-12)


def test_bell_with_reordering_matches_ell_end_to_end():
    import setups.setup_slab as slab
    from shakti_tpu.api.run import solve

    md1 = slab.initialize(nx=10, ny=10, days=2.0, nt_per_day=4)
    md1.operator = "ell"
    out1 = solve(md1, progress=False)

    md2 = slab.initialize(nx=10, ny=10, days=2.0, nt_per_day=4)
    md2.operator = "bell"   # forces RCB node reordering + block operator
    out2 = solve(md2, progress=False)
    assert md2.node_iperm is not None

    # histories are emitted in user order on both paths
    np.testing.assert_allclose(out1["history"]["N"], out2["history"]["N"],
                               rtol=1e-9)
    np.testing.assert_allclose(out1["history"]["b"], out2["history"]["b"],
                               rtol=1e-8)


def test_bcsr_matvec_matches_ell():
    from shakti_tpu.fem import bcsr as bcsrm
    nodes, cells = rectangle_mesh(9, 7, 1.0, 1.0, jitter=0.2, seed=13)
    n = nodes.shape[0]
    B = 16
    mesh = build_mesh(nodes, cells, dtype=jnp.float64, operator="both",
                      bell_block=B)
    brow, bcol, blk, off, dblk, doff, NB = bcsrm.build_bcsr(
        np.asarray(mesh.cells), n, B)
    rng = np.random.default_rng(5)
    J_c = jnp.asarray(rng.normal(size=(mesh.n_cells, 3, 3)))
    x = jnp.asarray(rng.normal(size=n))

    K = mesh.ell_cols.shape[1]
    y_ell = ellm.ell_matvec(ellm.ell_from_elements(J_c, mesh.ell_map, n, K),
                            mesh.ell_cols, x)

    vals = bcsrm.bcsr_from_elements(J_c, jnp.asarray(blk), jnp.asarray(off),
                                    brow.shape[0], B)
    y = bcsrm.bcsr_matvec(vals, jnp.asarray(brow), jnp.asarray(bcol), x, n, NB)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ell),
                               rtol=1e-11, atol=1e-13)

    d_ell = ellm.ell_diag(ellm.ell_from_elements(J_c, mesh.ell_map, n, K),
                          mesh.ell_diag_slot)
    d = bcsrm.bcsr_diag(vals, jnp.asarray(dblk), jnp.asarray(doff))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ell), rtol=1e-12)


def test_bcsr_end_to_end_matches_ell():
    import setups.setup_slab as slab
    from shakti_tpu.api.run import solve

    md1 = slab.initialize(nx=10, ny=10, days=2.0, nt_per_day=4)
    md1.operator = "ell"
    out1 = solve(md1, progress=False)

    md2 = slab.initialize(nx=10, ny=10, days=2.0, nt_per_day=4)
    md2.operator = "bcsr"
    out2 = solve(md2, progress=False)
    assert md2.node_iperm is not None
    np.testing.assert_allclose(out1["history"]["N"], out2["history"]["N"],
                               rtol=1e-9)

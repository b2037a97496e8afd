"""Pallas block-ELL SpMV kernel: correctness vs the XLA path (interpret
mode on CPU; the compiled kernel is exercised on real TPU hardware by the
benchmark environment)."""

import jax.numpy as jnp
import numpy as np

from shakti_tpu.fem import bell as bellm
from shakti_tpu.mesh.generate import rectangle_mesh
from shakti_tpu.mesh.mesh import build_mesh
from shakti_tpu.ops.spmv_pallas import bell_matvec_pallas


def test_pallas_bell_matvec_matches_xla_interpret():
    nodes, cells = rectangle_mesh(12, 12, 1.0, 1.0, jitter=0.2, seed=8)
    n = nodes.shape[0]
    mesh = build_mesh(nodes, cells, dtype=jnp.float32, operator="bell",
                      bell_block=128)
    NB, KB = mesh.bell_nbr.shape
    rng = np.random.default_rng(0)
    J_c = jnp.asarray(rng.normal(size=(mesh.n_cells, 3, 3)), jnp.float32)
    vals = bellm.bell_from_elements(J_c, mesh.bell_map, NB, KB, 128)
    x = jnp.asarray(rng.normal(size=n), jnp.float32)

    y_ref = bellm.bell_matvec(vals, mesh.bell_nbr, x, n)
    y_pl = bell_matvec_pallas(vals, mesh.bell_nbr, x, n, interpret=True)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                               rtol=2e-6, atol=1e-6)


def test_pallas_bell_matvec_compiled_on_tpu():
    """Compiled-mode check of the Pallas kernel (VERDICT r1 item 5): runs
    only when a real TPU backend is present (the suite pins CPU, where
    Mosaic cannot compile; the TPU queue scripts exercise this)."""
    import jax
    import pytest

    if jax.default_backend() != "tpu":
        pytest.skip("compiled Pallas path needs a TPU backend")

    nodes, cells = rectangle_mesh(16, 16, 1.0, 1.0, jitter=0.2, seed=8)
    n = nodes.shape[0]
    mesh = build_mesh(nodes, cells, dtype=jnp.float32, operator="bell",
                      bell_block=128)
    NB, KB = mesh.bell_nbr.shape
    rng = np.random.default_rng(1)
    J_c = jnp.asarray(rng.normal(size=(mesh.n_cells, 3, 3)), jnp.float32)
    vals = bellm.bell_from_elements(J_c, mesh.bell_map, NB, KB, 128)
    x = jnp.asarray(rng.normal(size=n), jnp.float32)

    y_ref = bellm.bell_matvec(vals, mesh.bell_nbr, x, n)
    y_pl = bell_matvec_pallas(vals, mesh.bell_nbr, x, n)   # compiled
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_ref),
                               rtol=2e-6, atol=1e-6)

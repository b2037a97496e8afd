"""Multi-device SPMD tests on 8 simulated CPU devices (SURVEY §4 item 4):
the sharded solver must agree with the single-device solver to tight
tolerance (it is the same arithmetic up to reduction order)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import setups.setup_slab as slab
from shakti_tpu.parallel.partition import partition_cells, rcb_partition
from shakti_tpu.parallel.shard import make_device_mesh, make_parallel_runner
from shakti_tpu.solve.timestep import make_step_fn, run_window, timestep_sizes


def test_rcb_balance_and_determinism():
    rng = np.random.default_rng(7)
    pts = rng.uniform(size=(1000, 2))
    part = rcb_partition(pts, 8)
    counts = np.bincount(part, minlength=8)
    assert counts.max() - counts.min() <= 1
    np.testing.assert_array_equal(part, rcb_partition(pts, 8))


def test_partition_cells_covers_all():
    import setups.setup_slab as s
    md = s.initialize(nx=10, ny=10)
    order, counts = partition_cells(md.nodes, md.cells, 8)
    assert counts.sum() == md.cells.shape[0]
    assert np.unique(order).size == md.cells.shape[0]


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_step_matches_single_device(ndev):
    assert len(jax.devices()) >= ndev
    md = slab.initialize(nx=12, ny=12, days=2.0, nt_per_day=4)
    mesh, static, state, cfg = md.freeze()
    dts = timestep_sizes(md.timesteps, dtype=md.dtype)[:8]

    step1 = make_step_fn(mesh, static, md.params, cfg)
    s1, d1 = jax.jit(lambda s, d: run_window(step1, s, d))(state, dts)

    jmesh = make_device_mesh(ndev)
    runner = make_parallel_runner(mesh, static, md.params, cfg, jmesh)
    s2, d2 = runner(state, dts)

    assert bool(np.asarray(d1["converged"]).all())
    assert bool(np.asarray(d2["converged"]).all())
    # same arithmetic, different reduction order -> tight but not bitwise
    np.testing.assert_allclose(np.asarray(s1.N), np.asarray(s2.N), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(s1.b), np.asarray(s2.b), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(s1.q), np.asarray(s2.q),
                               rtol=1e-6, atol=1e-18)


def test_sharded_output_is_replicated():
    md = slab.initialize(nx=8, ny=8, days=1.0, nt_per_day=4)
    mesh, static, state, cfg = md.freeze()
    jmesh = make_device_mesh(4)
    runner = make_parallel_runner(mesh, static, md.params, cfg, jmesh)
    dts = timestep_sizes(md.timesteps, dtype=md.dtype)[:2]
    s2, _ = runner(state, dts)
    # value must be fully replicated (addressable on every device, identical)
    shards = s2.N.addressable_shards
    assert len(shards) == 4
    ref = np.asarray(shards[0].data)
    for sh in shards[1:]:
        np.testing.assert_array_equal(ref, np.asarray(sh.data))

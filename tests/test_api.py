"""API/IO protocol tests: results directory layout, history cadence,
checkpoint/resume equivalence, pre-existing-directory abort
(reference solvers.py:57-238 behavior)."""

import os

import numpy as np
import pytest

import setups.setup_slab as slab
from shakti_tpu.api.run import solve, ConvergenceError


def make_md(tmp_path, name="run1", **kw):
    md = slab.initialize(nx=8, ny=8, days=5.0, nt_per_day=4,
                         results_name=str(tmp_path / name), **kw)
    return md


def test_results_layout_and_history_cadence(tmp_path):
    md = make_md(tmp_path)
    # make the last step a save step so the final row equals the final state
    md.timesteps = md.timesteps[: 4 * md.nt_save + 1]
    out = solve(md, progress=False)
    rdir = str(md.results_name)
    nt = md.timesteps.size
    n_saves = -(-nt // md.nt_save)
    for f in ("t.npy", "nodes_x.npy", "nodes_y.npy",
              "N.npy", "b.npy", "qx.npy", "qy.npy", "log.csv"):
        assert os.path.exists(os.path.join(rdir, f)), f
    N_hist = np.load(os.path.join(rdir, "N.npy"))
    assert N_hist.shape == (n_saves, md.x.size)
    assert np.load(os.path.join(rdir, "t.npy")).shape == (n_saves,)
    # provenance copy of the setup file (reference solvers.py:123-125)
    assert os.path.exists(os.path.join(rdir, "setup_slab.py"))
    # history rows populated (first row saved after step 0)
    assert np.abs(N_hist).max() > 0
    np.testing.assert_allclose(N_hist[-1], np.asarray(out["state"].N))


def test_existing_results_dir_aborts(tmp_path):
    md = make_md(tmp_path, name="dup")
    os.makedirs(md.results_name)
    with pytest.raises(FileExistsError):
        solve(md, progress=False)


def test_checkpoint_resume_bit_exact(tmp_path):
    # full run in one go
    md_full = make_md(tmp_path, name="full")
    out_full = solve(md_full, progress=False)

    # same run interrupted at the mid checkpoint, then resumed
    md_a = make_md(tmp_path, name="split")
    md_a.nt_check = 2 * md_a.nt_save   # checkpoint more often
    nt = md_a.timesteps.size
    md_a.timesteps = md_a.timesteps[: nt // 2 + 1]
    solve(md_a, progress=False)

    md_b = make_md(tmp_path, name="split2")
    md_b.results_name = md_a.results_name
    md_b.nt_check = 2 * md_b.nt_save
    out_b = solve(md_b, resume=True, progress=False)

    np.testing.assert_array_equal(np.asarray(out_full["state"].N),
                                  np.asarray(out_b["state"].N))
    np.testing.assert_array_equal(np.asarray(out_full["state"].b),
                                  np.asarray(out_b["state"].b))
    np.testing.assert_array_equal(out_full["history"]["N"], out_b["history"]["N"])


def test_in_memory_run_without_results_dir():
    md = slab.initialize(nx=8, ny=8, days=0.5, nt_per_day=4)
    assert md.results_name is None
    out = solve(md, progress=False)
    assert out["history"]["N"].shape[0] == -(-md.timesteps.size // md.nt_save)


def test_nonconvergence_raises():
    md = slab.initialize(nx=8, ny=8, days=0.5, nt_per_day=4)
    from shakti_tpu.solve.newton import NewtonConfig
    md.solver = NewtonConfig(max_iter=0)   # force failure
    with pytest.raises(ConvergenceError):
        solve(md, progress=False)

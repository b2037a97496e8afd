"""Golden-run regression tests (SURVEY §4 consequence item 3).

The stored goldens were produced by this framework's f64 CPU solver at a
state validated by the MMS convergence study, the physical-structure tests,
and the f32/f64 agreement study.  Any solver/assembly change that shifts
nodal fields beyond tight tolerance must be deliberate (regenerate with
tests/goldens/README instructions in this file's header docstring):

    python -c "import tests.regen_goldens"   # (see generation snippet in
                                             # the git history of goldens/)
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import setups.setup_lake as lake
import setups.setup_slab as slab
from shakti_tpu.solve.timestep import make_step_fn, run_window, timestep_sizes

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def run_case(md, n):
    mesh, static, state, cfg = md.freeze()
    step = make_step_fn(mesh, static, md.params, cfg)
    dts = timestep_sizes(md.timesteps, dtype=md.dtype)[:n]
    s, d = jax.jit(lambda a, b: run_window(step, a, b))(state, dts)
    assert bool(np.asarray(d["converged"]).all())
    return s


def compare(state, path):
    z = np.load(path)
    for k in ("N", "b", "q", "melt"):
        got = np.asarray(getattr(state, k))
        ref = z[k]
        scale = np.abs(ref).max() or 1.0
        np.testing.assert_allclose(got / scale, ref / scale, atol=1e-7,
                                   err_msg=f"golden drift in field {k}")


def test_slab_golden():
    md = slab.initialize(nx=12, ny=12, days=5.0, nt_per_day=4, seed=0)
    compare(run_case(md, 20),
            os.path.join(GOLDEN_DIR, "slab_12x12_20steps.npz"))


def test_lake_golden():
    md = lake.initialize(nx=16, ny=16, days=3.0, nt_per_day=4, seed=0)
    compare(run_case(md, 12),
            os.path.join(GOLDEN_DIR, "lake_16x16_12steps.npz"))

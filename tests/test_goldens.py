"""Golden-run regression tests (SURVEY §4 consequence item 3).

The stored goldens are produced by the INDEPENDENT oracle
(oracle/reference_oracle.py: standalone numpy/scipy assembly of the
reference weak form, analytic Jacobians, exact sparse-LU Newton, f64) — not
by this framework — so they validate the discretization against an
implementation that shares no code with physics/residual.py (VERDICT
round-1 item 2).  Regenerate deliberately after an intentional
solver-behavior change:

    python -m tests.regen_goldens
"""

import os

import jax
import numpy as np

from tests.golden_cases import lake_case, slab_case
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
    md, n, fname = slab_case()
    compare(run_case(md, n), os.path.join(GOLDEN_DIR, fname))


def test_lake_golden():
    md, n, fname = lake_case()
    compare(run_case(md, n), os.path.join(GOLDEN_DIR, fname))

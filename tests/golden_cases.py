"""Golden-test case definitions, shared by test_goldens.py (compare) and
regen_goldens.py (generate from the independent oracle).

ICs are smooth and strictly positive: with the setups' default gaussian
b_init noise, nodes where b_init <= 0 make |b|^3 near-zero and the step-1
Jacobian row near-null, so N there is solver-dependent (ill-posed limit —
see tests/test_oracle.py and VALIDATION.md).  Goldens must pin well-posed
trajectories.
"""

import numpy as np

import setups.setup_lake as lake
import setups.setup_slab as slab


def slab_case():
    md = slab.initialize(nx=12, ny=12, days=5.0, nt_per_day=4, seed=0)
    md.b_init = 0.001 * (1.0 + 0.5 * np.sin(2 * np.pi * md.x / 10e3)
                         * np.cos(2 * np.pi * md.y / 10e3))
    return md, 20, "slab_12x12_20steps.npz"


def lake_case():
    md = lake.initialize(nx=16, ny=16, days=3.0, nt_per_day=4, seed=0)
    md.b_init = 0.001 * (1.0 + 0.5 * np.sin(2 * np.pi * md.x / 40e3)
                         * np.cos(2 * np.pi * md.y / 40e3))
    return md, 12, "lake_16x16_12steps.npz"


ALL_CASES = (slab_case, lake_case)

"""Regenerate the golden trajectories from the INDEPENDENT oracle.

Run:  python -m tests.regen_goldens

The goldens are produced by oracle/reference_oracle.py — a standalone
numpy/scipy implementation of the reference weak form with hand-derived
analytic Jacobians and exact sparse-LU Newton in f64, sharing no code with
the framework's physics/solve layers.  test_goldens.py then checks the
framework against them, so a systematic framework discretization bug cannot
hide in its own goldens (VERDICT round-1 item 2).
"""

import os

import numpy as np

from oracle.reference_oracle import OracleModel, run_transient
from tests.golden_cases import ALL_CASES

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def generate(case):
    md, n_steps, fname = case()
    zeros = np.zeros(md.x.size)
    om = OracleModel(
        md.nodes, md.cells, z_b=md.z_b, z_s=md.z_s, G=md.G, inputs=md.inputs,
        storage=(md.lake_bdry if md.storage_on else zeros),
        dirichlet_nodes=md.dirichlet_nodes(), N_bdry=md.N_bdry,
        b_min=md.b_min, quad_degree=md.solver.quad_degree, interp_rule="avg")
    out = run_transient(om, md.N_init, md.b_init, md.q_init, zeros,
                        md.timesteps, n_steps=n_steps)
    assert all(out["converged"]), fname
    path = os.path.join(GOLDEN_DIR, fname)
    np.savez(path, N=out["N"][-1], b=out["b"][-1], q=out["q"][-1],
             melt=out["melt"][-1], generator=np.bytes_(b"oracle"))
    print(f"wrote {path}  ({n_steps} steps, {md.x.size} nodes)")


if __name__ == "__main__":
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for case in ALL_CASES:
        generate(case)

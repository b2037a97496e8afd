"""Physical diagnostics: mass balance, boundary discharge, water budgets.

The reference computes flood discharge and budgets offline in notebooks
(solution-plots.ipynb cell 12).  Here they are in-framework and exact with
respect to the discretization:

  * boundary_discharge: the FEM 'reaction force' identity — at a converged
    solve the assembled residual vanishes at free nodes, so the UNMASKED
    residual summed over Dirichlet nodes equals the boundary flux integral
    the weak form dropped:  sum_j in D  F_j = -∮ q·n ds   [m^3/s].
  * water_production: independent quadrature of the interior sources,
    ∫ (inputs + C - (1/rho_i - 1/rho_w) m) dx  [m^3/s].

At steady state the two must agree (global mass conservation of the
discretization) — asserted in tests/test_diagnostics.py to ~1%.
"""

from __future__ import annotations

import jax.numpy as jnp

from shakti_tpu.fem import ops
from shakti_tpu.fem.ops import ein
from shakti_tpu.params import PhysicalParams
from shakti_tpu.physics import constitutive as law
from shakti_tpu.physics import residual as res


def boundary_discharge(mesh, static, state, params: PhysicalParams,
                       quad_degree: int = 4, dt: float = 1.0) -> float:
    """Net outflow through the Dirichlet boundary [m^3/s] (positive = out).

    Valid at (near-)steady state where the free-node residual is ~0; the
    lake-storage term is evaluated with N_n = N, i.e. it drops out.
    """
    pre = res.precompute_step(mesh, state.N, state.b, state.q, state.melt,
                              static, jnp.asarray(dt, state.N.dtype), params,
                              quad_degree)
    F = res.assemble_residual(state.N, pre, mesh, params)
    # sum_D F_j = -∮ q·n ds  =>  net outflow = -sum_D F_j
    return -float(jnp.sum(jnp.where(static.dirichlet, F, 0.0)))


def water_production(mesh, static, state, params: PhysicalParams,
                     quad_degree: int = 4) -> float:
    """∫ (inputs + C(b, N) - (1/rho_i - 1/rho_w) m) dx  [m^3/s]:
    the interior net water source that must leave through the boundary."""
    p = params
    pre = res.precompute_step(mesh, state.N, state.b, state.q, state.melt,
                              static, jnp.asarray(1.0, state.N.dtype), params,
                              quad_degree)
    N_c = ops.gather_cells(mesh, state.N)
    N_dev = N_c - jnp.mean(N_c, axis=1, keepdims=True)
    grad_N = ein("ci,cid->cd", N_dev, mesh.grads)
    grad_h = pre.gb0 - grad_N / (p.rho_w * p.g)
    qdgh = ein("cqd,cd->cq", pre.q_q, grad_h)
    m_q = (pre.G_q - p.rho_w * p.g * qdgh) / p.Lh + pre.mdiff_q
    N_q = ein("qi,ci->cq", pre.phi, N_c)
    C_q = law.closure(pre.b_q, N_q, p)
    c_m = 1.0 / p.rho_i - 1.0 / p.rho_w
    src_q = pre.inputs_q + C_q - c_m * m_q
    w_cell = mesh.area * mesh.cell_valid
    return float(jnp.sum(w_cell * ein("q,cq->c", pre.wq, src_q)))

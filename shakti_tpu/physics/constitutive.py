"""Constitutive relations of the SHAKTI model as pure jax.numpy functions.

Feature-parity with reference source/constitutive.py:6-41 (which expresses the
same closures as UFL graphs).  Here every function is a plain array->array map
that works on nodal values, quadrature-point values, or per-cell values alike,
and is differentiable by JAX AD (the reference relies on UFL `derivative` for
its Newton Jacobian; we rely on `jax.jvp`/`jax.jacfwd` instead).

Because gradients of P1 fields are cellwise-constant, functions that need
`grad(h)` / `grad(b)` take those gradients as explicit arguments — the caller
computes them with the FEM layer (shakti_tpu.fem.ops.cell_grad).  This
replaces UFL's symbolic `grad`/`div` with explicit data flow, which is what
XLA wants: no hidden graph rewriting, everything is fusible elementwise work.
"""

from __future__ import annotations

import jax.numpy as jnp

from shakti_tpu.params import PhysicalParams


def head(N, z_b, z_s, p: PhysicalParams):
    """Hydraulic head [m]  (reference constitutive.py:6-9).

    h = z_b + (rho_i/rho_w) (z_s - z_b) - N / (rho_w g)
    """
    return z_b + (p.rho_i / p.rho_w) * (z_s - z_b) - N / (p.rho_w * p.g)


def head_gradient(grad_zb, grad_zs, grad_N, p: PhysicalParams):
    """grad(h) given gradients of its ingredients (all (..., 2) arrays)."""
    r = p.rho_i / p.rho_w
    return grad_zb + r * (grad_zs - grad_zb) - grad_N / (p.rho_w * p.g)


def background_head_gradient(grad_zb, grad_zs, p: PhysicalParams):
    """grad(h) at N == 0: the 'background' hydraulic gradient
    (reference constitutive.py:33-36)."""
    r = p.rho_i / p.rho_w
    return grad_zb + r * (grad_zs - grad_zb)


def background_potential(z_b, z_s, p: PhysicalParams):
    """rho_w g h(N=0)  [Pa]  (reference constitutive.py:38-41).

    Used for outflow-boundary detection and mesh generation, not in the PDE.
    """
    return p.rho_w * p.g * head(jnp.zeros_like(z_b), z_b, z_s, p)


def water_flux(b, grad_h, Re, p: PhysicalParams):
    """Depth-integrated water flux q [m^2/s]  (reference constitutive.py:11-16).

    q = - |b|^3 g grad(h) / (12 nu (1 + omega Re))

    `b`, `Re` have shape (...,); `grad_h` has shape (..., 2).
    The abs() guards negative gap heights exactly as the reference does.
    """
    coeff = -(jnp.abs(b) ** 3) * p.g / (12.0 * p.nu * (1.0 + p.omega * Re))
    return coeff[..., None] * grad_h


def transmissivity(b, Re, p: PhysicalParams):
    """Scalar coefficient T such that q = -T grad(h)."""
    return (jnp.abs(b) ** 3) * p.g / (12.0 * p.nu * (1.0 + p.omega * Re))


def reynolds(q, p: PhysicalParams):
    """Local Reynolds number |q| / nu  (reference constitutive.py:18-20).

    Uses sqrt(q.q) like the reference (no epsilon guard): at q == 0 the value
    is 0 and the derivative is never needed because Re enters the weak form
    as *frozen* (previous-step) data, outside the Newton linearization
    (reference solvers.py:28-45 freezes q during the N-solve).

    Values are bit-identical to a plain sqrt; the where-guards only choose
    the subgradient 0 at q == 0 (sqrt's AD rule there is inf -> NaN), so
    reverse-mode transients (NewtonConfig.differentiable) stay finite at
    the q = 0 initial state and at dead halo slots.
    """
    s = jnp.sum(q * q, axis=-1)
    live = s > 0
    return jnp.where(live, jnp.sqrt(jnp.where(live, s, 1.0)), 0.0) / p.nu


def melt_opening(q, grad_h, G, p: PhysicalParams):
    """Dissipation + geothermal melt m0 [kg/(m^2 s)]: the first term of
    reference constitutive.py:22-25:  (G - rho_w g q . grad(h)) / Lh."""
    qdot = jnp.sum(q * grad_h, axis=-1)
    return (G - p.rho_w * p.g * qdot) / p.Lh


def melt_regularization(b, melt, grad_b, grad_melt):
    """Warburton et al. (2024) melt-diffusion term, evaluated pointwise
    *within a cell* (reference constitutive.py:26).

    m_diff = div( b m grad(b) / (1 + |grad(b)|^2) )

    For P1 fields, grad(b) =: c is constant per cell, so within a cell
        w = (b m) c / (1 + |c|^2)   and
        div w = c . grad(b m) / (1 + |c|^2)
              = c . (m grad(b) + b grad(m)) / (1 + |c|^2),
    which is exactly what UFL's symbolic div produces at each quadrature /
    interpolation point.  `grad_b`, `grad_melt` are the cellwise-constant
    gradients; `b`, `melt` the pointwise values.
    """
    denom = 1.0 + jnp.sum(grad_b * grad_b, axis=-1)
    num = jnp.sum(grad_b * (melt[..., None] * grad_b + b[..., None] * grad_melt),
                  axis=-1)
    return num / denom


def melt(q, grad_h, G, b, melt_prev, grad_b, grad_melt_prev, p: PhysicalParams):
    """Full melt rate m = m0 + m_diff  (reference constitutive.py:22-27).

    `b`, `melt_prev` are the lagged (previous-step) gap height and melt rate;
    `grad_b`, `grad_melt_prev` their cellwise gradients (reference
    solvers.py:154-165 evaluates m_diff with lagged fields).
    """
    return (melt_opening(q, grad_h, G, p)
            + melt_regularization(b, melt_prev, grad_b, grad_melt_prev))


def closure(b, N, p: PhysicalParams):
    """Viscous creep closure C = A b N |N|^(n-1) [m/s]
    (reference constitutive.py:29-31)."""
    return p.A * b * N * jnp.abs(N) ** (p.n - 1.0)


def closure_rate(N, p: PhysicalParams):
    """Creep-closure rate per unit gap, C/b = A N |N|^(n-1) [1/s].

    The closure law is linear in b, so an implicit (backward-Euler)
    treatment of the closure term in the gap evolution is a scalar
    division: b_new = (b + dt m/rho_i) / (1 + dt closure_rate(N)) — the
    unconditionally stable update the steady-state driver (solve/steady.py)
    uses to march with pseudo-timesteps far beyond the closure timescale.
    Kept separate from :func:`closure` so the transient path's arithmetic
    (and its golden trajectories) stays bit-identical.
    """
    return p.A * N * jnp.abs(N) ** (p.n - 1.0)

"""Unit tests: constitutive closures vs hand-computed values
(SURVEY §4 consequence item 1; relations from reference constitutive.py:6-41)."""

import jax.numpy as jnp
import numpy as np
import pytest

from shakti_tpu.params import DEFAULT_PARAMS as P
from shakti_tpu.physics import constitutive as law


def test_head():
    # h = z_b + (rho_i/rho_w)(z_s - z_b) - N/(rho_w g)
    N, z_b, z_s = jnp.asarray(9810.0), jnp.asarray(100.0), jnp.asarray(600.0)
    expected = 100.0 + 0.917 * 500.0 - 9810.0 / (1000.0 * 9.81)
    assert float(law.head(N, z_b, z_s, P)) == pytest.approx(expected, rel=1e-12)


def test_head_gradient_consistency():
    # gradient form must equal the gradient of the pointwise form
    gzb = jnp.array([0.01, 0.0])
    gzs = jnp.array([0.03, -0.02])
    gN = jnp.array([10.0, 5.0])
    g = law.head_gradient(gzb, gzs, gN, P)
    expected = gzb + (P.rho_i / P.rho_w) * (gzs - gzb) - gN / (P.rho_w * P.g)
    np.testing.assert_allclose(np.asarray(g), np.asarray(expected), rtol=1e-14)


def test_water_flux_laminar_limit():
    # Re = 0: q = -b^3 g grad(h) / (12 nu)
    b = jnp.asarray(1e-3)
    gh = jnp.array([0.02, 0.0])
    q = law.water_flux(b, gh, jnp.asarray(0.0), P)
    expected = -(1e-9) * 9.81 * 0.02 / (12 * 1.787e-6)
    assert float(q[0]) == pytest.approx(expected, rel=1e-12)
    assert float(q[1]) == 0.0


def test_water_flux_abs_guard():
    # negative b must behave like |b| (reference constitutive.py:14 abs())
    gh = jnp.array([0.01, 0.0])
    q_pos = law.water_flux(jnp.asarray(2e-3), gh, jnp.asarray(5.0), P)
    q_neg = law.water_flux(jnp.asarray(-2e-3), gh, jnp.asarray(5.0), P)
    np.testing.assert_allclose(np.asarray(q_pos), np.asarray(q_neg), rtol=1e-14)


def test_reynolds():
    q = jnp.array([3e-4, 4e-4])
    assert float(law.reynolds(q, P)) == pytest.approx(5e-4 / 1.787e-6, rel=1e-12)


def test_melt_opening():
    q = jnp.array([1e-3, 0.0])
    gh = jnp.array([-0.05, 0.0])
    G = jnp.asarray(0.06)
    m = law.melt_opening(q, gh, G, P)
    expected = (0.06 - 1000.0 * 9.81 * (1e-3 * -0.05)) / 3.34e5
    assert float(m) == pytest.approx(expected, rel=1e-12)


def test_melt_regularization_within_cell():
    # w = b m c/(1+|c|^2); div w = c . (m c + b grad m)/(1+|c|^2)
    b, m = jnp.asarray(2e-3), jnp.asarray(1e-7)
    grad_b = jnp.array([0.5, -0.25])
    grad_m = jnp.array([1e-8, 2e-8])
    out = law.melt_regularization(b, m, grad_b, grad_m)
    c2 = 0.5**2 + 0.25**2
    expected = (0.5 * (1e-7 * 0.5 + 2e-3 * 1e-8)
                + (-0.25) * (1e-7 * -0.25 + 2e-3 * 2e-8)) / (1 + c2)
    assert float(out) == pytest.approx(expected, rel=1e-12)


def test_closure_sign_and_value():
    b, N = jnp.asarray(1e-3), jnp.asarray(-2e5)
    C = law.closure(b, N, P)
    expected = 2.24e-24 * 1e-3 * (-2e5) * (2e5) ** 2
    assert float(C) == pytest.approx(expected, rel=1e-12)


def test_artesian_opening_feedback():
    """N < 0 (artesian: water pressure above overburden — suites D/F
    reach window-mean N of -0.76 MPa, SHMIP.md artesian note) must OPEN
    the gap: the SIGNED closure N |N|^(n-1) (reference
    constitutive.py:29-31) is the negative feedback that drains the
    over-pressurized sheet.  Pins the law's oddness, the rate sign, and
    the semi-implicit gap update the steady path uses."""
    b = jnp.asarray(1e-3)
    C_neg = float(law.closure(b, jnp.asarray(-5e5), P))
    C_pos = float(law.closure(b, jnp.asarray(5e5), P))
    assert C_neg == pytest.approx(-C_pos, rel=1e-14)
    assert C_neg < 0.0 < C_pos
    cr = float(law.closure_rate(jnp.asarray(-5e5), P))
    assert cr < 0.0
    # backward-Euler in b (linear closure): negative rate grows the gap
    dt = 0.1 / abs(cr)
    assert float(b) / (1.0 + dt * cr) > float(b)


def test_background_potential():
    z_b, z_s = jnp.asarray(-50.0), jnp.asarray(950.0)
    phi = law.background_potential(z_b, z_s, P)
    expected = 1000.0 * 9.81 * (-50.0 + 0.917 * 1000.0)
    assert float(phi) == pytest.approx(expected, rel=1e-12)

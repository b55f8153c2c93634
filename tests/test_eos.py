"""Unit tests for the Cole EOS."""
import numpy as np
import pytest
import jax.numpy as jnp

from gpusph_tpu.ops import eos
from gpusph_tpu.params import Fluid, PhysParams

PP = PhysParams(fluids=(Fluid(rho0=1000.0, gamma=7.0, c0=40.0),))
PP2 = PhysParams(
    fluids=(
        Fluid(rho0=1000.0, gamma=7.0, c0=40.0),
        Fluid(rho0=2350.0, gamma=7.0, c0=20.0),
    )
)


def test_pressure_at_rest_is_zero():
    p = eos.pressure(PP, jnp.zeros(4), jnp.zeros(4, jnp.int32))
    np.testing.assert_allclose(np.asarray(p), 0.0, atol=1e-6)


def test_pressure_known_value():
    # B = rho0 c0^2/gamma; P(rho_tilde) = B((1+rt)^7 - 1)
    rt = 0.01
    b = 1000.0 * 40.0**2 / 7.0
    expected = b * ((1 + rt) ** 7 - 1)
    p = float(eos.pressure(PP, jnp.float32(rt), jnp.int32(0)))
    assert p == pytest.approx(expected, rel=1e-5)


def test_roundtrip():
    rt = jnp.asarray([0.0, 0.005, 0.02, -0.01], jnp.float32)
    fl = jnp.zeros(4, jnp.int32)
    p = eos.pressure(PP, rt, fl)
    back = eos.density_from_pressure(PP, p, fl)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rt), atol=1e-5)


def test_sound_speed_at_rest():
    c = float(eos.sound_speed(PP, jnp.float32(0.0), jnp.int32(0)))
    assert c == pytest.approx(40.0, rel=1e-6)


def test_multifluid_select():
    rt = jnp.zeros(2, jnp.float32)
    fl = jnp.asarray([0, 1], jnp.int32)
    rho = np.asarray(eos.physical_density(PP2, rt, fl))
    np.testing.assert_allclose(rho, [1000.0, 2350.0])
    c = np.asarray(eos.sound_speed(PP2, rt, fl))
    np.testing.assert_allclose(c, [40.0, 20.0], rtol=1e-6)


def test_hydrostatic_density():
    # depth such that P = rho0 g d
    d = 0.4
    rt = float(eos.hydrostatic_density(PP, d, 0))
    p = float(eos.pressure(PP, jnp.float32(rt), jnp.int32(0)))
    assert p == pytest.approx(1000.0 * 9.81 * d, rel=2e-3)

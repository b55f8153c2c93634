"""Unit tests for SPH smoothing kernels: normalization, derivative, cutoff."""
import numpy as np
import pytest
import jax.numpy as jnp

from gpusph_tpu.defs import KERNEL_RADIUS, KernelType
from gpusph_tpu.ops.kernels import F, W

ALL_KERNELS = list(KernelType)
H = 0.03


@pytest.mark.parametrize("kt", ALL_KERNELS)
def test_normalization(kt):
    """Integral of W over its 3D support must be 1."""
    R = KERNEL_RADIUS[kt] * H
    n = 400
    r = (np.arange(n) + 0.5) * (R / n)
    w = np.asarray(W(kt, jnp.asarray(r, jnp.float32), H), np.float64)
    integral = np.sum(4 * np.pi * r**2 * w) * (R / n)
    assert integral == pytest.approx(1.0, rel=2e-3)


@pytest.mark.parametrize("kt", ALL_KERNELS)
def test_f_is_radial_derivative(kt):
    """F(r) must equal (1/r) dW/dr (finite-difference check)."""
    R = KERNEL_RADIUS[kt] * H
    r = np.linspace(0.15 * R, 0.95 * R, 31)
    eps = 1e-4 * H
    w_plus = np.asarray(W(kt, jnp.asarray(r + eps, jnp.float32), H), np.float64)
    w_minus = np.asarray(W(kt, jnp.asarray(r - eps, jnp.float32), H), np.float64)
    dwdr = (w_plus - w_minus) / (2 * eps)
    f = np.asarray(F(kt, jnp.asarray(r, jnp.float32), H), np.float64)
    np.testing.assert_allclose(f, dwdr / r, rtol=2e-2, atol=1e-2 / H**4)


@pytest.mark.parametrize("kt", ALL_KERNELS)
def test_cutoff_zero(kt):
    """W vanishes at the kernel radius."""
    R = KERNEL_RADIUS[kt] * H
    w_edge = float(W(kt, jnp.float32(R), H))
    w_center = float(W(kt, jnp.float32(0.0), H))
    assert abs(w_edge) < 1e-5 * w_center


def test_wendland_value():
    """Wendland peak value: W(0) = 21/(16 pi h^3)."""
    expected = 21.0 / (16.0 * np.pi * H**3)
    assert float(W(KernelType.WENDLAND, jnp.float32(0.0), H)) == pytest.approx(
        expected, rel=1e-5
    )


def test_wendland_gradient_is_attractive_inward():
    """F < 0 inside the support (dW/dr < 0)."""
    r = jnp.asarray(np.linspace(0.01, 1.9, 20) * H, jnp.float32)
    f = np.asarray(F(KernelType.WENDLAND, r, H))
    assert (f < 0).all()

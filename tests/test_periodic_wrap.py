"""Periodic position wrapping in the euler update."""
import numpy as np
import jax.numpy as jnp

from gpusph_tpu import Periodicity
from gpusph_tpu.ops.integrate import wrap_periodic
from gpusph_tpu.ops.neighbors import make_grid


def test_wrap_periodic_axes_only():
    grid = make_grid((0, 0, -1), (2, 1, 3), 0.3, Periodicity.XY)
    pos = jnp.asarray(
        [[2.3, -0.2, 5.0], [-0.1, 0.5, -2.0], [1.0, 0.99, 0.0]], jnp.float32
    )
    w = np.asarray(wrap_periodic(grid, pos))
    # x wraps into [0,2), y into [0,1), z untouched
    np.testing.assert_allclose(w[0], [0.3, 0.8, 5.0], atol=1e-5)
    np.testing.assert_allclose(w[1], [1.9, 0.5, -2.0], atol=1e-5)
    np.testing.assert_allclose(w[2], [1.0, 0.99, 0.0], atol=1e-6)

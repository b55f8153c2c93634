"""DEM terrain tests (reference `src/cuda/geom_core.cu`, `TopoCube`)."""
import io
import os

import numpy as np
import pytest

from gpusph_tpu.ops.dem import (dem_height_normal, load_dem_ascii, pack_dem,
                                unpack_dem)


def test_dem_interpolation_flat_slope():
    """Bilinear height + tangent normal on an analytic inclined plane."""
    import jax.numpy as jnp

    cols, rows = 40, 30
    ew = ns = 0.1
    x = ew * (np.arange(cols) + 0.5)
    y = ns * (np.arange(rows) + 0.5)
    X, Y = np.meshgrid(x, y)
    h = 0.2 * X + 0.1 * Y + 0.3
    dem = pack_dem(h, x[0], y[0], ew, ns)
    pts = np.array([[1.0, 1.0, 5.0], [2.5, 1.7, 5.0], [0.7, 2.2, 5.0]])
    z0, n = dem_height_normal(dem, jnp.asarray(pts, jnp.float32))
    np.testing.assert_allclose(
        np.asarray(z0), 0.2 * pts[:, 0] + 0.1 * pts[:, 1] + 0.3, atol=1e-5)
    # normal of z = 0.2x + 0.1y + c is (-0.2, -0.1, 1)/|.|
    ref = np.array([-0.2, -0.1, 1.0])
    ref = ref / np.linalg.norm(ref)
    np.testing.assert_allclose(np.asarray(n), np.tile(ref, (3, 1)), atol=1e-3)


def test_dem_ascii_roundtrip(tmp_path):
    """GRASS ASCII loader (DEM_FMT_ASCII semantics)."""
    p = tmp_path / "dem.txt"
    rows, cols = 4, 5
    h = np.arange(rows * cols, dtype=np.float32).reshape(rows, cols)
    with open(p, "w") as f:
        f.write("north: 4.0\nsouth: 0.0\neast: 5.0\nwest: 0.0\n")
        f.write(f"rows: {rows}\ncols: {cols}\n")
        for r in range(rows):
            f.write(" ".join(str(v) for v in h[r]) + "\n")
    dem = load_dem_ascii(str(p))
    hh, west, south, ew, ns = unpack_dem(dem)
    assert hh.shape == (rows, cols)
    # first file row is the NORTH edge
    np.testing.assert_allclose(hh[-1], h[0])
    assert ew == 1.0 and ns == 1.0


@pytest.mark.slow
def test_dem_example_runs():
    """DEMExample: fluid settles onto the terrain without penetration."""
    from gpusph_tpu.integrator import Simulator
    from gpusph_tpu.problems.base import get_problem

    P = get_problem("DEMExample")(dict(deltap=0.15))
    grid, state = P.build()
    sim = Simulator(P.fw, grid)
    state = sim.run(state, maxiter=30, tend=0.0)
    pos = np.asarray(state.pos)
    act = np.asarray(state.active)
    assert not np.isnan(pos).any()
    import jax.numpy as jnp
    from gpusph_tpu.ops.dem import dem_height_normal

    z0, _ = dem_height_normal(P.fw.dem, jnp.asarray(pos[act]))
    # no particle sinks below the terrain surface
    assert (pos[act, 2] > np.asarray(z0) - 0.5 * P.deltap).all()

"""Native C++ runtime components vs the pure-python reference paths."""
import numpy as np
import pytest

from gpusph_tpu import native
from gpusph_tpu.geometry import primitives as geo
from gpusph_tpu.io.vtk import read_vtu

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_fill_box_matches_python():
    origin, size, dp = (0.1, 0.2, 0.3), (0.5, 0.4, 0.3), 0.05
    a = geo.fill_box(origin, size, dp)
    b = native.fill_box(origin, size, dp)
    assert len(a) == len(b)
    sa = a[np.lexsort(a.T)]
    sb = b[np.lexsort(b.T)]
    np.testing.assert_allclose(sa, sb, atol=1e-12)


def test_fill_sphere_matches_python():
    a = geo.fill_sphere((0.5, 0.5, 0.5), 0.3, 0.05)
    b = native.fill_sphere((0.5, 0.5, 0.5), 0.3, 0.05)
    assert len(a) == len(b)
    sa = a[np.lexsort(a.T)]
    sb = b[np.lexsort(b.T)]
    np.testing.assert_allclose(sa, sb, atol=1e-12)


def test_dedup_matches_python(rng):
    pts = rng.uniform(size=(500, 3))
    pts = np.concatenate([pts, pts[:100]])  # duplicates
    a = geo._dedup(pts, 0.01)
    b = native.dedup_points(pts, 0.01)
    assert len(a) == len(b)


def test_native_vtu_roundtrip(tmp_path, rng):
    n = 64
    pos = rng.uniform(size=(n, 3)).astype(np.float32)
    vel = rng.normal(size=(n, 3)).astype(np.float32)
    rho = rng.uniform(size=n).astype(np.float32)
    ids = np.arange(n, dtype=np.uint32)
    path = str(tmp_path / "out.vtu")
    ok = native.write_vtu(path, pos, {"Velocity": vel, "Density": rho, "Id": ids})
    assert ok
    back = read_vtu(path)
    np.testing.assert_allclose(back["pos"], pos)
    np.testing.assert_allclose(back["Velocity"], vel)
    np.testing.assert_allclose(back["Density"], rho)
    np.testing.assert_array_equal(back["Id"], ids)

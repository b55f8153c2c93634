"""STL loading + surface fill + inside test."""
import struct

import numpy as np

from gpusph_tpu.geometry.stl import fill_stl_surface, load_stl, stl_inside_predicate


def unit_cube_tris():
    """12 triangles of the unit cube."""
    f = []
    for axis in range(3):
        for side in (0.0, 1.0):
            a1, a2 = (axis + 1) % 3, (axis + 2) % 3
            c = np.zeros(3); c[axis] = side
            p = [c.copy() for _ in range(4)]
            p[1][a1] = 1
            p[2][a1] = 1; p[2][a2] = 1
            p[3][a2] = 1
            f.append([p[0], p[1], p[2]])
            f.append([p[0], p[2], p[3]])
    return np.asarray(f)


def write_binary_stl(path, tris):
    with open(path, "wb") as fp:
        fp.write(b"\0" * 80)
        fp.write(struct.pack("<I", len(tris)))
        for t in tris:
            fp.write(struct.pack("<3f", 0, 0, 0))
            for v in t:
                fp.write(struct.pack("<3f", *v))
            fp.write(struct.pack("<H", 0))


def test_binary_roundtrip(tmp_path):
    tris = unit_cube_tris()
    p = str(tmp_path / "cube.stl")
    write_binary_stl(p, tris)
    back = load_stl(p)
    assert back.shape == (12, 3, 3)
    np.testing.assert_allclose(back, tris, atol=1e-6)


def test_ascii_load(tmp_path):
    tris = unit_cube_tris()[:2]
    p = tmp_path / "tri.stl"
    with open(p, "w") as f:
        f.write("solid t\n")
        for t in tris:
            f.write(" facet normal 0 0 0\n  outer loop\n")
            for v in t:
                f.write(f"   vertex {v[0]} {v[1]} {v[2]}\n")
            f.write("  endloop\n endfacet\n")
        f.write("endsolid t\n")
    back = load_stl(str(p))
    assert back.shape == (2, 3, 3)


def test_surface_fill_covers_cube():
    tris = unit_cube_tris()
    pts = fill_stl_surface(tris, 0.1)
    assert len(pts) > 500
    # all points on the cube surface
    on_face = np.zeros(len(pts), bool)
    for a in range(3):
        on_face |= np.isclose(pts[:, a], 0) | np.isclose(pts[:, a], 1)
    assert on_face.all()


def test_inside_predicate():
    tris = unit_cube_tris()
    inside = stl_inside_predicate(tris)
    probe = np.array([[0.5, 0.5, 0.5], [1.5, 0.5, 0.5], [0.9, 0.9, 0.1],
                      [-0.1, 0.2, 0.2]])
    np.testing.assert_array_equal(inside(probe), [True, False, True, False])

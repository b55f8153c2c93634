"""STL mesh loading and particle filling.

TPU-native counterpart of the reference's `src/geometries/STLMesh.{h,cc}`
(`addSTLMesh`, `src/problem_api/ProblemAPI_1.h:288`): load binary or ASCII
STL, sample each triangle on a ~dp lattice to produce boundary particles,
and provide an inside test (ray parity) for erase operations.
"""
from __future__ import annotations

import struct

import numpy as np


def load_stl(path: str) -> np.ndarray:
    """Load an STL file; returns triangles [n,3,3] float64."""
    with open(path, "rb") as f:
        head = f.read(5)
    if head.startswith(b"solid"):
        try:
            return _load_ascii(path)
        except ValueError:
            pass  # some binary files start with 'solid'
    return _load_binary(path)


def _load_binary(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        f.seek(80)
        (n,) = struct.unpack("<I", f.read(4))
        data = np.fromfile(f, dtype=np.float32, count=n * 12 + 0)
    # each record: normal(3) + 3 vertices(9) + attr(uint16); read structured
    with open(path, "rb") as f:
        f.seek(84)
        rec = np.frombuffer(
            f.read(n * 50),
            dtype=np.dtype(
                [("n", "<3f4"), ("v", "<(3,3)f4"), ("attr", "<u2")]
            ),
        )
    return rec["v"].astype(np.float64)


def _load_ascii(path: str) -> np.ndarray:
    tris = []
    cur = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if parts[:1] == ["vertex"]:
                cur.append([float(x) for x in parts[1:4]])
                if len(cur) == 3:
                    tris.append(cur)
                    cur = []
    if not tris:
        raise ValueError("no triangles parsed")
    return np.asarray(tris, np.float64)


def fill_stl_surface(tris: np.ndarray, dp: float) -> np.ndarray:
    """Sample the mesh surface at ~dp spacing (STLMesh::FillBorder analogue)."""
    pts = []
    for v0, v1, v2 in tris:
        e1 = v1 - v0
        e2 = v2 - v0
        n1 = max(1, int(np.ceil(np.linalg.norm(e1) / dp)))
        n2 = max(1, int(np.ceil(np.linalg.norm(e2) / dp)))
        a = (np.arange(n1 + 1) / n1)[:, None]
        b = (np.arange(n2 + 1) / n2)[None, :]
        mask = (a + b) <= 1.0 + 1e-9
        A = np.broadcast_to(a, mask.shape)[mask]
        B = np.broadcast_to(b, mask.shape)[mask]
        pts.append(v0[None, :] + A[:, None] * e1[None, :] + B[:, None] * e2[None, :])
    from .primitives import _dedup

    return _dedup(np.concatenate(pts, axis=0), dp)


def stl_inside_predicate(tris: np.ndarray):
    """Ray-parity inside test for erase operations (Object::IsInside)."""
    v0 = tris[:, 0]
    e1 = tris[:, 1] - tris[:, 0]
    e2 = tris[:, 2] - tris[:, 0]

    def inside(points: np.ndarray) -> np.ndarray:
        # Moller-Trumbore ray parity; the slightly irrational direction
        # avoids hitting shared triangle edges exactly (double counting)
        d = np.array([0.03304043, 0.05571483, 0.99790407])
        d = d / np.linalg.norm(d)
        out = np.zeros(len(points), bool)
        h = np.cross(d, e2)  # [n,3]
        a = np.einsum("nd,nd->n", e1, h)
        ok = np.abs(a) > 1e-12
        inv_a = np.where(ok, 1.0 / np.where(ok, a, 1.0), 0.0)
        for i, p in enumerate(points):
            s = p[None, :] - v0
            u = np.einsum("nd,nd->n", s, h) * inv_a
            q = np.cross(s, e1)
            v = (q @ d) * inv_a
            t = np.einsum("nd,nd->n", e2, q) * inv_a
            hit = ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 1e-9)
            out[i] = (hit.sum() % 2) == 1
        return out

    return inside


__all__ = ["load_stl", "fill_stl_surface", "stl_inside_predicate"]

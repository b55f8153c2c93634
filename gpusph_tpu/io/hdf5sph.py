"""HDF5Sph (.h5sph) reader/writer — the Crixus pre-processor interchange
format used by the reference for SA-boundary problem inputs
(`src/HDF5SphReader.cc:52-150`: one compound dataset named ``Compound`` with
Coords/Normal/Volume/Surface/ParticleType/FluidType/KENT/MovingBoundary/
AbsoluteIndex/VertexParticle1-3 members).

Reading yields plain numpy arrays; :func:`h5sph_sa_mesh` converts the
vertex+boundary rows to the procedural SA-mesh dict consumed by
``Problem.build`` (see :mod:`gpusph_tpu.geometry.sa_mesh`), so h5sph input
and procedural SA geometry share one code path.  The writer exists for
round-trip tests and to let users export procedurally-generated SA meshes.

h5py is optional in principle; importing this module without it raises a
clear error only when the functions are used.
"""
from __future__ import annotations

from typing import Dict, Optional

import numpy as np

try:
    import h5py

    HAS_H5PY = True
except ImportError:  # pragma: no cover - h5py is baked into this image
    h5py = None
    HAS_H5PY = False

# Crixus particle-type codes (reference `src/Reader.h:33-36`)
H5SPH_FLUID = 1
H5SPH_VERTEX = 2
H5SPH_BOUNDARY = 3
H5SPH_BOUNDARY_PARTICLE = 4

_DATASET = "Compound"
_FIELDS = [
    ("Coords_0", np.float64), ("Coords_1", np.float64), ("Coords_2", np.float64),
    ("Normal_0", np.float64), ("Normal_1", np.float64), ("Normal_2", np.float64),
    ("Volume", np.float64), ("Surface", np.float64),
    ("ParticleType", np.int32), ("FluidType", np.int32), ("KENT", np.int32),
    ("MovingBoundary", np.int32), ("AbsoluteIndex", np.int32),
    ("VertexParticle1", np.int32), ("VertexParticle2", np.int32),
    ("VertexParticle3", np.int32),
]


def _require_h5py():
    if not HAS_H5PY:
        raise ImportError("h5py is required for .h5sph I/O")


def read_h5sph(path: str) -> Dict[str, np.ndarray]:
    """Read an .h5sph file into a dict of column arrays.

    Returns ``pos [N,3]``, ``normal [N,3]``, ``volume [N]``, ``surface [N]``,
    ``ptype [N]`` (Crixus codes), ``fluid_type``, ``kent``, ``moving``,
    ``abs_index`` and ``vertex_idx [N,3]`` (AbsoluteIndex references of the
    3 vertices of each boundary element)."""
    _require_h5py()
    with h5py.File(path, "r") as f:
        d = f[_DATASET][()]
    names = d.dtype.names

    def col(name, default=0.0):
        if name in names:
            return np.asarray(d[name])
        return np.full(len(d), default)

    return dict(
        pos=np.stack([col(f"Coords_{i}") for i in range(3)], axis=1),
        normal=np.stack([col(f"Normal_{i}") for i in range(3)], axis=1),
        volume=col("Volume"),
        surface=col("Surface"),
        ptype=col("ParticleType", H5SPH_FLUID).astype(np.int64),
        fluid_type=col("FluidType", 0).astype(np.int64),
        kent=col("KENT", 0).astype(np.int64),
        moving=col("MovingBoundary", 0).astype(np.int64),
        abs_index=col("AbsoluteIndex", 0).astype(np.int64),
        vertex_idx=np.stack(
            [col(f"VertexParticle{i}", 0) for i in (1, 2, 3)], axis=1
        ).astype(np.int64),
    )


def write_h5sph(path: str, *, pos, ptype, normal=None, volume=None,
                surface=None, fluid_type=None, kent=None, moving=None,
                abs_index=None, vertex_idx=None) -> None:
    """Write an .h5sph file (compound layout of HDF5SphReader.cc:110-126)."""
    _require_h5py()
    pos = np.asarray(pos, np.float64)
    n = len(pos)
    ptype = np.asarray(ptype, np.int32)

    def arr(v, shape, dtype):
        if v is None:
            return np.zeros(shape, dtype)
        return np.asarray(v, dtype).reshape(shape)

    normal = arr(normal, (n, 3), np.float64)
    vertex_idx = arr(vertex_idx, (n, 3), np.int32)
    if abs_index is None:
        abs_index = np.arange(n)
    rec = np.zeros(n, dtype=np.dtype(_FIELDS))
    for i in range(3):
        rec[f"Coords_{i}"] = pos[:, i]
        rec[f"Normal_{i}"] = normal[:, i]
        rec[f"VertexParticle{i + 1}"] = vertex_idx[:, i]
    rec["Volume"] = arr(volume, (n,), np.float64)
    rec["Surface"] = arr(surface, (n,), np.float64)
    rec["ParticleType"] = ptype
    rec["FluidType"] = arr(fluid_type, (n,), np.int32)
    rec["KENT"] = arr(kent, (n,), np.int32)
    rec["MovingBoundary"] = arr(moving, (n,), np.int32)
    rec["AbsoluteIndex"] = np.asarray(abs_index, np.int32)
    with h5py.File(path, "w") as f:
        f.create_dataset(_DATASET, data=rec)


def h5sph_fluid(data: Dict[str, np.ndarray]):
    """Fluid rows -> (points [N,3], volume [N]).  The reference sets each
    fluid particle's mass to rho0*Volume (ProblemAPI_1.cc:1959-1961)."""
    m = data["ptype"] == H5SPH_FLUID
    return data["pos"][m], data["volume"][m]


def h5sph_sa_mesh(data: Dict[str, np.ndarray],
                  io: Optional[tuple] = None) -> Dict[str, np.ndarray]:
    """Vertex + boundary rows -> SA mesh dict (sa_mesh.py layout).

    Vertex rows carry the fluid-side Voronoi volume in ``Volume``; boundary
    rows carry the element normal/area and the AbsoluteIndex references of
    their 3 vertices (ProblemAPI_1.cc:2003-2022)."""
    vm = data["ptype"] == H5SPH_VERTEX
    bm = (data["ptype"] == H5SPH_BOUNDARY) | (
        data["ptype"] == H5SPH_BOUNDARY_PARTICLE
    )
    verts = data["pos"][vm]
    nv = len(verts)
    # AbsoluteIndex -> local vertex index (vectorized: searchsorted over
    # the sorted vertex AbsoluteIndex; the reference checks and reports
    # dangling references, ProblemAPI_1.cc:2241)
    abs_v = np.asarray(data["abs_index"][vm], np.int64)
    sort = np.argsort(abs_v)
    abs_sorted = abs_v[sort]
    refs = np.asarray(data["vertex_idx"][bm], np.int64).reshape(-1, 3)
    loc = np.searchsorted(abs_sorted, refs)
    bad = (loc >= len(abs_sorted)) | (
        abs_sorted[np.minimum(loc, len(abs_sorted) - 1)] != refs
    )
    if bad.any():
        seg, k = np.argwhere(bad)[0]
        raise ValueError(
            f"h5sph SA mesh: boundary element {seg} references vertex "
            f"AbsoluteIndex {refs[seg, k]} which is not among the "
            f"{len(abs_sorted)} vertex rows (corrupt Crixus file?)"
        )
    vidx = sort[loc]
    seg_pos = data["pos"][bm]
    # per-segment vertex positions relative to the barycenter
    seg_verts = verts[vidx] - seg_pos[:, None, :]
    # vertex normal: area-weighted average of adjacent segment normals
    # (used only for IO vertex spawn direction; Crixus does not store it)
    vert_normal = np.zeros((nv, 3))
    w = data["surface"][bm][:, None] * data["normal"][bm]
    for k in range(3):
        np.add.at(vert_normal, vidx[:, k], w)
    norm = np.linalg.norm(vert_normal, axis=1, keepdims=True)
    vert_normal = np.where(norm > 0, vert_normal / np.maximum(norm, 1e-30), 0.0)
    mesh = dict(
        verts=verts,
        vert_normal=vert_normal,
        vert_volume=data["volume"][vm],
        seg_pos=seg_pos,
        seg_normal=data["normal"][bm],
        seg_verts=seg_verts,
        seg_area=data["surface"][bm],
        seg_vidx=vidx,
    )
    if io is not None:
        mesh["io"] = io
    return mesh


__all__ = [
    "read_h5sph", "write_h5sph", "h5sph_fluid", "h5sph_sa_mesh",
    "H5SPH_FLUID", "H5SPH_VERTEX", "H5SPH_BOUNDARY", "H5SPH_BOUNDARY_PARTICLE",
    "HAS_H5PY",
]

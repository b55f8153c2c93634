"""HDF5Sph reader/writer + legacy-VTK writer tests (reference
`src/HDF5SphReader.cc`, `src/writers/VTKLegacyWriter.cc`)."""
import numpy as np
import pytest

from gpusph_tpu.io.hdf5sph import (
    H5SPH_BOUNDARY,
    H5SPH_FLUID,
    H5SPH_VERTEX,
    HAS_H5PY,
    h5sph_fluid,
    h5sph_sa_mesh,
    read_h5sph,
    write_h5sph,
)
from gpusph_tpu.io.vtk import VTKLegacyWriter, read_vtk_legacy

pytestmark = pytest.mark.skipif(not HAS_H5PY, reason="h5py not available")


def _mesh_to_h5sph(path, mesh, fluid_pts=None, fluid_vol=0.0):
    """Serialize a procedural SA mesh (sa_mesh dict) as a Crixus h5sph."""
    rows = []
    nv = len(mesh["verts"])
    ns = len(mesh["seg_pos"])
    nf = 0 if fluid_pts is None else len(fluid_pts)
    pos = np.concatenate(
        [fluid_pts if nf else np.zeros((0, 3)), mesh["verts"], mesh["seg_pos"]]
    )
    ptype = np.concatenate(
        [np.full(nf, H5SPH_FLUID), np.full(nv, H5SPH_VERTEX),
         np.full(ns, H5SPH_BOUNDARY)]
    )
    normal = np.concatenate(
        [np.zeros((nf + nv, 3)), mesh["seg_normal"]]
    )
    volume = np.concatenate(
        [np.full(nf, fluid_vol), mesh["vert_volume"], np.zeros(ns)]
    )
    surface = np.concatenate([np.zeros(nf + nv), mesh["seg_area"]])
    # AbsoluteIndex: global row index; VertexParticleK reference vertex rows
    abs_index = np.arange(nf + nv + ns)
    vertex_idx = np.concatenate(
        [np.zeros((nf + nv, 3), np.int64), mesh["seg_vidx"] + nf]
    )
    write_h5sph(path, pos=pos, ptype=ptype, normal=normal, volume=volume,
                surface=surface, abs_index=abs_index, vertex_idx=vertex_idx)
    return rows


def test_h5sph_roundtrip(tmp_path, rng):
    n = 40
    pos = rng.uniform(size=(n, 3))
    ptype = rng.integers(1, 4, size=n)
    vol = rng.uniform(size=n)
    path = str(tmp_path / "t.h5sph")
    write_h5sph(path, pos=pos, ptype=ptype, volume=vol)
    back = read_h5sph(path)
    np.testing.assert_allclose(back["pos"], pos)
    np.testing.assert_array_equal(back["ptype"], ptype)
    np.testing.assert_allclose(back["volume"], vol)


def test_h5sph_sa_mesh_matches_procedural(tmp_path):
    """Writing a procedural SA box mesh as .h5sph and reading it back through
    h5sph_sa_mesh must reproduce the mesh (same geometry path as build())."""
    from gpusph_tpu.geometry.sa_mesh import box_sa_mesh

    mesh = box_sa_mesh((0, 0, 0), (0.4, 0.3, 0.2), 0.1)
    path = str(tmp_path / "box.h5sph")
    _mesh_to_h5sph(path, mesh)
    back = h5sph_sa_mesh(read_h5sph(path))
    np.testing.assert_allclose(back["verts"], mesh["verts"])
    np.testing.assert_allclose(back["vert_volume"], mesh["vert_volume"])
    np.testing.assert_allclose(back["seg_pos"], mesh["seg_pos"])
    np.testing.assert_allclose(back["seg_normal"], mesh["seg_normal"])
    np.testing.assert_allclose(back["seg_area"], mesh["seg_area"])
    np.testing.assert_allclose(back["seg_verts"], mesh["seg_verts"], atol=1e-12)
    np.testing.assert_array_equal(back["seg_vidx"], mesh["seg_vidx"])


def test_add_hdf5_file_build(tmp_path):
    """A StillWaterSA-like problem built from .h5sph input runs build()."""
    from gpusph_tpu.geometry.sa_mesh import box_sa_mesh
    from gpusph_tpu.problems.base import get_problem

    P = get_problem("StillWaterSA")(dict(ppH=6))
    ref_grid, ref_state = P.build()

    # export its SA mesh + a fluid block, then rebuild via add_hdf5_file
    P2 = get_problem("StillWaterSA")(dict(ppH=6))
    mesh = P2.sa_meshes[0] if P2.sa_meshes else None
    assert mesh is not None
    fpath = str(tmp_path / "f.h5sph")
    fluid_geos = [g for g in P2.geometries if len(g.points)]
    pts = np.concatenate([g.points for g in fluid_geos])
    rho0 = P2.fw.pp.fluids[0].rho0
    _mesh_to_h5sph(fpath, mesh, fluid_pts=pts, fluid_vol=P2.deltap ** 3)
    P2.geometries.clear()
    P2.sa_meshes.clear()
    P2.add_hdf5_file(0, fpath)  # GT_FLUID rows
    from gpusph_tpu.problems.base import GeometryType

    P2.sa_meshes.append(h5sph_sa_mesh(read_h5sph(fpath)))
    grid, state = P2.build()
    assert int(state.count_active()) == int(ref_state.count_active())
    # fluid mass = rho0 * volume per particle
    m = np.asarray(state.mass)[: len(pts)]
    np.testing.assert_allclose(m, rho0 * P2.deltap ** 3, rtol=1e-5)


def test_vtk_legacy_roundtrip(tmp_path, rng):
    w = VTKLegacyWriter(str(tmp_path))
    n = 50
    arrays = {
        "pos": rng.uniform(size=(n, 3)),
        "Velocity": rng.normal(size=(n, 3)).astype(np.float32),
        "Pressure": rng.uniform(size=n).astype(np.float32),
        "Density": rng.uniform(1.0, 2.0, size=n).astype(np.float32),
        "Mass": np.full(n, 0.25, np.float32),
        "Info": rng.integers(0, 2 ** 20, size=n).astype(np.uint32),
        "Id": np.arange(n, dtype=np.uint32),
    }
    path = w.write(0.125, arrays)
    back = read_vtk_legacy(path)
    np.testing.assert_allclose(back["pos"], arrays["pos"], rtol=1e-6)
    np.testing.assert_allclose(back["Velocity"], arrays["Velocity"], rtol=1e-6)
    np.testing.assert_allclose(back["Pressure"], arrays["Pressure"], rtol=1e-6)
    np.testing.assert_array_equal(
        back["Type+flags"], np.asarray(arrays["Info"]) & 0xFFFF
    )
    np.testing.assert_array_equal(back["ParticleId"], arrays["Id"])
    import os

    assert os.path.exists(os.path.join(tmp_path, "VTUinp.pvd"))

"""Viscosity engine (shear rate/SPS/effective visc) + postprocess tests."""
import numpy as np
import pytest
import jax.numpy as jnp

from gpusph_tpu import (
    BoundaryType,
    Fluid,
    ParticleType,
    Periodicity,
    PhysParams,
    RheologyType,
    SimParams,
    TurbulenceModel,
    setup_framework,
)
from gpusph_tpu.ops.neighbors import build_cells, make_grid
from gpusph_tpu.ops.postprocess import surface_detection, vorticity
from gpusph_tpu.ops.postprocess import testpoint_values as interp_testpoints
from gpusph_tpu.ops.visc import effective_viscosity, shear_rate_tensor
from gpusph_tpu.state import FG_SURFACE, empty_state, has_flag, is_fluid


DP = 0.05


def lattice_state(box=1.0, dp=DP, zmax=None, testpoints=()):
    xs = np.arange(dp / 2, box, dp)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
    if zmax is not None:
        g = g[g[:, 2] < zmax]
    n = len(g) + len(testpoints)
    st = empty_state(n)
    info = np.full(n, int(ParticleType.FLUID), np.uint32)
    pos = g
    if testpoints:
        pos = np.concatenate([g, np.asarray(testpoints)])
        info[len(g):] = np.uint32(int(ParticleType.TESTPOINT))
    return st.replace(
        pos=jnp.asarray(pos, jnp.float32),
        mass=jnp.full(n, 1000.0 * dp**3, jnp.float32),
        info=jnp.asarray(info),
    )


def make_fw(**kw):
    return setup_framework(
        boundary=BoundaryType.DYN_BOUNDARY,
        simparams=SimParams(deltap=DP),
        physparams=PhysParams(fluids=(Fluid(rho0=1000.0, c0=20.0),)),
        **kw,
    ).finalize()


def test_shear_rate_linear_field(rng):
    """v = (A*z, 0, 0): mixed tensor XZ component = A for bulk particles."""
    fw = make_fw(periodicity=Periodicity.XY)
    A = 2.0
    st = lattice_state()
    st = st.replace(vel=st.vel.at[:, 0].set(A * st.pos[:, 2]))
    grid = make_grid((0, 0, 0), (1, 1, 1), fw.influenceradius, Periodicity.XY)
    sst, aux = build_cells(grid, st)
    tau = np.asarray(shear_rate_tensor(fw, grid, sst, aux, chunk_cells=16))
    # bulk = away from the z boundaries (kernel support truncated there)
    z = np.asarray(sst.pos)[:, 2]
    bulk = (z > 0.25) & (z < 0.75)
    np.testing.assert_allclose(tau[bulk, 2], A, rtol=0.05)  # XZ
    assert np.abs(tau[bulk, 0]).max() < 0.05 * A  # XX ~ 0


def test_vorticity_rigid_rotation(rng):
    """v = Omega x r: curl v = 2*Omega."""
    fw = make_fw(periodicity=Periodicity.NONE)
    omega = 3.0
    st = lattice_state()
    pos = np.asarray(st.pos)
    c = pos - 0.5
    vel = np.stack([-omega * c[:, 1], omega * c[:, 0], 0 * c[:, 2]], -1)
    st = st.replace(vel=jnp.asarray(vel, jnp.float32))
    grid = make_grid((0, 0, 0), (1, 1, 1), fw.influenceradius)
    sst, aux = build_cells(grid, st)
    w = np.asarray(vorticity(fw, grid, sst, aux, chunk_cells=16))
    p = np.asarray(sst.pos)
    bulk = np.all((p > 0.25) & (p < 0.75), axis=1)
    np.testing.assert_allclose(w[bulk, 2], 2 * omega, rtol=0.05)
    assert np.abs(w[bulk, :2]).max() < 0.05 * omega


def test_testpoint_interpolation():
    fw = make_fw()
    st = lattice_state(testpoints=[(0.5, 0.5, 0.5)])
    st = st.replace(vel=st.vel.at[:, 1].set(1.5))
    grid = make_grid((0, 0, 0), (1, 1, 1), fw.influenceradius)
    sst, aux = build_cells(grid, st)
    vel, press = interp_testpoints(fw, grid, sst, aux, chunk_cells=16)
    tp = np.asarray(sst.info) & 7 == int(ParticleType.TESTPOINT)
    np.testing.assert_allclose(np.asarray(vel)[tp, 1], 1.5, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(press)[tp], 0.0, atol=10.0)


def test_surface_detection_half_filled_box(rng):
    fw = make_fw()
    st = lattice_state(zmax=0.5)
    # jitter: on a perfect lattice the interior normal is pure f32 noise and
    # the cone criterion (same as the reference's) is ill-posed there
    jitter = rng.uniform(-0.12 * DP, 0.12 * DP, np.asarray(st.pos).shape)
    st = st.replace(pos=st.pos + jnp.asarray(jitter, jnp.float32))
    grid = make_grid((0, 0, 0), (1, 1, 1), fw.influenceradius)
    sst, aux = build_cells(grid, st)
    info, normals = surface_detection(fw, grid, sst, aux, chunk_cells=16)
    surf = np.asarray(has_flag(info, FG_SURFACE))
    z = np.asarray(sst.pos)[:, 2]
    act = np.asarray(sst.active)
    # the top fluid layer must be flagged...
    top = act & (z > 0.5 - DP)
    mid = act & (z > 0.15) & (z < 0.3)
    assert surf[top].mean() > 0.9
    # ...interior particles mostly not
    assert surf[mid].mean() < 0.2


def test_effective_viscosity_power_law():
    fw = setup_framework(
        boundary=BoundaryType.DYN_BOUNDARY,
        rheology=RheologyType.POWER_LAW,
        periodicity=Periodicity.XY,
        simparams=SimParams(deltap=DP),
        physparams=PhysParams(
            fluids=(
                Fluid(rho0=1000.0, c0=20.0, kinematic_visc=1e-3,
                      visc_nonlinear_param=0.5),
            )
        ),
    ).finalize()
    A = 2.0
    st = lattice_state()
    st = st.replace(vel=st.vel.at[:, 0].set(A * st.pos[:, 2]))
    grid = make_grid((0, 0, 0), (1, 1, 1), fw.influenceradius, Periodicity.XY)
    sst, aux = build_cells(grid, st)
    nu = np.asarray(effective_viscosity(fw, grid, sst, aux, chunk_cells=16))
    z = np.asarray(sst.pos)[:, 2]
    bulk = (z > 0.25) & (z < 0.75)
    # power law: nu_eff = K * shrate^(n-1) / rho; shrate ~ A
    expected = 1e-3 * 1000.0 * A ** (0.5 - 1.0) / 1000.0
    np.testing.assert_allclose(nu[bulk], expected, rtol=0.1)

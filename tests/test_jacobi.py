"""Jacobi effective-pressure solver: lithostatic sediment column."""
import numpy as np
import jax.numpy as jnp

from gpusph_tpu import (
    BoundaryType,
    Fluid,
    ParticleType,
    Periodicity,
    PhysParams,
    RheologyType,
    SimFlags,
    SimParams,
    TurbulenceModel,
    setup_framework,
)
from gpusph_tpu.ops.jacobi import detect_surface_interface, jacobi_effpres
from gpusph_tpu.ops.neighbors import build_cells, make_grid
from gpusph_tpu.state import (
    FG_SEDIMENT,
    FG_SURFACE,
    empty_state,
    has_flag,
    part_type,
)

DP = 0.02
RHO0 = 1000.0


def sediment_column(nx=8, nz_sed=10, nz_floor=3, jitter=0.02,
                    jacobi_backerr=1e-5, jacobi_maxiter=400):
    """Periodic-XY sediment column over a DYN floor; returns (fw, grid, state).

    A tiny position jitter breaks the perfect lattice symmetry (exact-zero
    interior normals would degenerate the cone criterion to 0>0, something
    that never happens with real particle distributions)."""
    fw = setup_framework(
        boundary=BoundaryType.DYN_BOUNDARY,
        rheology=RheologyType.GRANULAR,
        turbulence_model=TurbulenceModel.LAMINAR_FLOW,
        periodicity=Periodicity.XY,
        flags=SimFlags.ENABLE_DTADAPT,
        simparams=SimParams(deltap=DP, max_parts_per_cell=64,
                            jacobi_backerr=jacobi_backerr,
                            jacobi_maxiter=jacobi_maxiter),
        physparams=PhysParams(
            fluids=(Fluid(rho0=RHO0, gamma=7.0, c0=30.0,
                          kinematic_visc=1e-4, sinpsi=0.5),),
            gravity=(0.0, 0.0, -9.81),
        ),
    ).finalize()

    lx = nx * DP
    xs = (np.arange(nx) + 0.5) * DP
    zs_floor = -(np.arange(nz_floor) + 0.5) * DP
    zs_sed = (np.arange(nz_sed) + 0.5) * DP

    def lattice(zvals):
        g = np.stack(np.meshgrid(xs, xs, zvals, indexing="ij"), -1)
        return g.reshape(-1, 3)

    p_floor = lattice(zs_floor)
    p_sed = lattice(zs_sed)
    rng = np.random.default_rng(42)
    p_sed = p_sed + rng.uniform(-jitter * DP, jitter * DP, p_sed.shape)
    N = len(p_floor) + len(p_sed)
    st = empty_state(N)
    pos = np.concatenate([p_floor, p_sed]).astype(np.float32)
    info = np.concatenate([
        np.full(len(p_floor), int(ParticleType.BOUNDARY), np.uint32),
        np.full(len(p_sed), int(ParticleType.FLUID) | FG_SEDIMENT, np.uint32),
    ])
    st = st.replace(
        pos=jnp.asarray(pos),
        mass=jnp.full((N,), RHO0 * DP**3, jnp.float32),
        rho=jnp.zeros((N,), jnp.float32),
        info=jnp.asarray(info),
    )
    grid = make_grid(
        (0.0, 0.0, -(nz_floor + 1) * DP),
        (lx, lx, (nz_floor + nz_sed + 3) * DP),
        fw.influenceradius,
        periodic=Periodicity.XY,
    )
    return fw, grid, st


def test_surface_detection_on_column(rng):
    fw, grid, st = sediment_column()
    sst, aux = build_cells(grid, st)
    info = detect_surface_interface(fw, grid, sst, aux, chunk_cells=16)
    surf = np.asarray(has_flag(info, FG_SURFACE))
    z = np.asarray(sst.pos)[:, 2]
    fluid = np.asarray(part_type(sst.info)) == 0
    z_top = z[fluid].max()
    # the top lattice layer is detected as free surface; deep layers are not
    assert surf[fluid & (z > z_top - 0.4 * DP)].all()
    assert not surf[fluid & (z < z_top - 3 * DP)].any()


def test_jacobi_lithostatic_profile(rng):
    """Converged effective pressure follows the lithostatic profile
    delta_rho * g * depth (+ the Dirichlet offset at the surface).

    Plain Jacobi contracts slowly (spectral radius ~cos(pi/2n) for an
    n-layer column), so the test uses a short column and a backward-error
    threshold of 1e-4 (|delta p_eff| < 1 Pa per iteration)."""
    fw, grid, st = sediment_column(nz_sed=6, jacobi_backerr=1e-4)
    sst, aux = build_cells(grid, st)
    ep, info, iters = jacobi_effpres(fw, grid, sst, aux, chunk_cells=16)
    # maxiter exit is a legitimate termination like the reference's
    # JACOBI_STOP_CRITERION (counter > maxiter also stops); the physics
    # assertions below are the actual convergence check
    assert 0 < int(iters) <= fw.sp.jacobi_maxiter

    z = np.asarray(sst.pos)[:, 2]
    fluid = np.asarray(part_type(sst.info)) == 0
    from gpusph_tpu.state import FG_INTERFACE

    surf = np.asarray(has_flag(info, FG_SURFACE) | has_flag(info, FG_INTERFACE))
    ep = np.asarray(ep)

    g = 9.81
    # Dirichlet value at the detected surface
    np.testing.assert_allclose(
        ep[fluid & surf], DP * RHO0 * g, rtol=1e-5
    )
    # interior: linear lithostatic profile (slope delta_rho * g within 15%)
    interior = fluid & ~surf
    zi, pi = z[interior], ep[interior]
    assert interior.sum() > 60
    slope = np.polyfit(zi, pi, 1)[0]
    np.testing.assert_allclose(-slope, RHO0 * g, rtol=0.15)
    # monotonic on the lattice average: deeper -> higher effpres
    z_levels = np.unique(np.round(zi / DP))
    means = [pi[np.round(zi / DP) == lv].mean() for lv in z_levels]
    assert all(a > b for a, b in zip(means, means[1:]))


def test_jacobi_in_sim_chunk(rng):
    """Granular rheology end-to-end: the chunk runs the EFFPRES solve before
    each forces pass and the column stays put (yielded but stable)."""
    from gpusph_tpu.integrator import make_sim_chunk
    from gpusph_tpu.bodies import init_bodies_state

    fw, grid, st = sediment_column(nz_sed=5, jacobi_backerr=1e-4,
                                   jacobi_maxiter=150)
    st = st.replace(extras={"effpres": jnp.zeros((st.capacity,), jnp.float32)})
    chunk = make_sim_chunk(fw, grid, chunk_cells=16, steps_per_chunk=3,
                           use_pallas=False)
    import jax

    dt = jnp.float32(1e-5)
    out = chunk(st, dt, jnp.float32(0.0), jnp.int32(0),
                init_bodies_state((), st))
    new_state = out[0]
    assert np.isfinite(np.asarray(new_state.pos)).all()
    assert np.isfinite(np.asarray(new_state.extras["effpres"])).all()
    assert np.asarray(new_state.extras["effpres"]).max() > 0.0

"""Grenier sigma/volume formulation vs brute-force float64 reference."""
import numpy as np
import pytest
import jax.numpy as jnp

from gpusph_tpu import (
    BoundaryType,
    DensityDiffusionType,
    Fluid,
    ParticleType,
    PhysParams,
    RheologyType,
    SimFlags,
    SimParams,
    SPHFormulation,
    TurbulenceModel,
    setup_framework,
)
from gpusph_tpu.ops.forces import compute_forces
from gpusph_tpu.ops.grenier import grenier_density_sigma
from gpusph_tpu.ops.neighbors import build_cells, make_grid
from gpusph_tpu.state import empty_state

from reference_sph import brute_grenier_density, brute_grenier_forces

DP = 0.02
RHO0S = (1000.0, 1100.0)
C0S = (25.0, 25.0)
GAMMAS = (7.0, 7.0)


def make_two_fluid_scene(rng, n_fluid=180, n_bound=70, box=0.3):
    """Random two-fluid blob + boundary shell particles."""
    capacity = n_fluid + n_bound + 14
    st = empty_state(capacity)
    n = n_fluid + n_bound
    pos = np.concatenate(
        [
            rng.uniform(0.05, box - 0.05, size=(n_fluid, 3)),
            rng.uniform(0.0, box, size=(n_bound, 3)),
        ]
    ).astype(np.float32)
    vel = np.zeros((capacity, 3), np.float32)
    vel[:n_fluid] = rng.normal(0, 0.4, size=(n_fluid, 3))
    rho = np.zeros(capacity, np.float32)  # refreshed by the density pass
    f_num = np.zeros(capacity, np.int64)
    f_num[:n_fluid] = rng.integers(0, 2, size=n_fluid)
    mass = np.zeros(capacity, np.float32)
    mass[:n] = np.asarray([RHO0S[k] for k in f_num[:n]]) * DP**3
    info = np.full(capacity, int(ParticleType.NONE), np.uint32)
    info[:n_fluid] = np.uint32(int(ParticleType.FLUID)) | (
        f_num[:n_fluid].astype(np.uint32) << 16
    )
    info[n_fluid:n] = np.uint32(int(ParticleType.BOUNDARY))
    ptype = np.full(capacity, 4, np.int64)
    ptype[:n_fluid] = 0
    ptype[n_fluid:n] = 1

    # perturbed volume state: J != 0 exercises the exp(J)*V0 path
    J = np.zeros(capacity, np.float32)
    J[:n] = rng.uniform(-0.01, 0.01, size=n)
    vol0 = np.zeros(capacity, np.float32)
    vol0[:n] = DP**3
    extras = {
        "grenier_J": jnp.asarray(J),
        "grenier_vol0": jnp.asarray(vol0),
    }
    st = st.replace(
        pos=jnp.asarray(np.pad(pos, ((0, capacity - n), (0, 0)))),
        vel=jnp.asarray(vel),
        rho=jnp.asarray(rho),
        mass=jnp.asarray(mass),
        info=jnp.asarray(info),
        extras=extras,
    )
    return st, ptype, f_num


def grenier_fw(*, kinvisc=0.0, artvisc=0.0, xi=0.0, epsinterface=0.0):
    fluids = tuple(
        Fluid(rho0=r, gamma=g, c0=c, kinematic_visc=kinvisc)
        for r, g, c in zip(RHO0S, GAMMAS, C0S)
    )
    return setup_framework(
        formulation=SPHFormulation.SPH_GRENIER,
        boundary=BoundaryType.DYN_BOUNDARY,
        rheology=RheologyType.NEWTONIAN if kinvisc > 0 else RheologyType.INVISCID,
        turbulence_model=(
            TurbulenceModel.ARTIFICIAL if artvisc > 0
            else TurbulenceModel.LAMINAR_FLOW
        ),
        density_diffusion=(
            DensityDiffusionType.COLAGROSSI if xi else DensityDiffusionType.NONE
        ),
        flags=SimFlags.ENABLE_DTADAPT | SimFlags.ENABLE_MULTIFLUID,
        simparams=SimParams(
            deltap=DP,
            max_parts_per_cell=64,
            densityDiffCoeff=xi if xi else float("nan"),
        ),
        physparams=PhysParams(
            fluids=fluids,
            gravity=(0.0, 0.0, -9.81),
            artvisccoeff=artvisc if artvisc else 0.3,
            epsinterface=epsinterface,
        ),
    ).finalize()


def run_grenier_case(rng, **kw):
    fw = grenier_fw(**kw)
    st, ptype, f_num = make_two_fluid_scene(rng)
    grid = make_grid((0, 0, 0), (0.3, 0.3, 0.3), fw.influenceradius)
    sst, aux = build_cells(grid, st)

    sigma, rho_tilde = grenier_density_sigma(fw, grid, sst, aux, chunk_cells=16)
    sst = sst.replace(rho=rho_tilde)
    out = compute_forces(fw, grid, sst, aux, chunk_cells=16, sigma=sigma)

    # brute-force reference in the sorted order
    act = np.asarray(sst.active)
    pos = np.asarray(sst.pos, np.float64)
    mass = np.asarray(sst.mass, np.float64)
    fn_s = np.asarray((np.asarray(sst.info) >> 16) & 0xFF, np.int64)
    pt_s = np.where(
        act,
        np.asarray(np.asarray(sst.info) & 0x7, np.int64),
        4,
    )
    vol = np.exp(np.asarray(sst.extras["grenier_J"], np.float64)) * np.asarray(
        sst.extras["grenier_vol0"], np.float64
    )
    b_sigma, b_rho = brute_grenier_density(
        pos, mass, pt_s, fn_s, np.maximum(vol, 1e-30), h=fw.sp.slength
    )

    proc = pt_s <= 1
    np.testing.assert_allclose(
        np.asarray(sigma)[proc], b_sigma[proc], rtol=2e-5, atol=1e-3
    )
    rho0 = np.asarray([RHO0S[k] for k in fn_s])
    rho_phys = (np.asarray(rho_tilde, np.float64) + 1.0) * rho0
    np.testing.assert_allclose(
        rho_phys[proc], b_rho[proc], rtol=5e-5, atol=1e-6
    )

    b_dv, b_dj = brute_grenier_forces(
        pos,
        np.asarray(sst.vel, np.float64),
        b_rho,
        b_sigma,
        np.maximum(vol, 1e-30),
        mass,
        pt_s,
        fn_s,
        h=fw.sp.slength,
        rho0s=RHO0S,
        c0s=C0S,
        gammas=GAMMAS,
        gravity=(0.0, -0.0, -9.81),
        artvisc_alpha=kw.get("artvisc", 0.0),
        epsartvisc=fw.pp.epsartvisc,
        kinviscs=(
            (kw["kinvisc"],) * 2 if kw.get("kinvisc", 0.0) > 0 else None
        ),
        epsinterface=kw.get("epsinterface", 0.0),
        colagrossi_xi=kw.get("xi", 0.0),
    )
    scale = np.maximum(np.abs(b_dv).max(), 1.0)
    np.testing.assert_allclose(
        np.asarray(out.DvDt)[proc], b_dv[proc], atol=2e-4 * scale
    )
    dj_scale = np.maximum(np.abs(b_dj).max(), 1e-6)
    np.testing.assert_allclose(
        np.asarray(out.DrDt)[pt_s <= 1], b_dj[pt_s <= 1],
        atol=2e-4 * dj_scale,
    )


def test_grenier_pressure_only(rng):
    run_grenier_case(rng)


def test_grenier_artvisc(rng):
    run_grenier_case(rng, artvisc=0.3)


def test_grenier_morris(rng):
    run_grenier_case(rng, kinvisc=1e-4)


def test_grenier_colagrossi_surface_tension(rng):
    run_grenier_case(rng, artvisc=0.2, xi=0.1, epsinterface=0.08)


def test_grenier_espanol_revenga_smoke(rng):
    """Grenier + Espanol-Revenga volumic coefficient (1/s_a+1/s_b): finite,
    and damps relative motion (no brute-force reference yet)."""
    from gpusph_tpu import ViscousModel

    fluids = tuple(
        Fluid(rho0=r, gamma=g, c0=c, kinematic_visc=1e-4, bulk_visc=0.05)
        for r, g, c in zip(RHO0S, GAMMAS, C0S)
    )
    fw = setup_framework(
        formulation=SPHFormulation.SPH_GRENIER,
        boundary=BoundaryType.DYN_BOUNDARY,
        rheology=RheologyType.NEWTONIAN,
        visc_model=ViscousModel.ESPANOL_REVENGA,
        flags=SimFlags.ENABLE_DTADAPT | SimFlags.ENABLE_MULTIFLUID,
        simparams=SimParams(deltap=DP, max_parts_per_cell=64),
        physparams=PhysParams(fluids=fluids, gravity=(0.0, 0.0, -9.81)),
    ).finalize()
    st, ptype, f_num = make_two_fluid_scene(rng)
    grid = make_grid((0, 0, 0), (0.3, 0.3, 0.3), fw.influenceradius)
    sst, aux = build_cells(grid, st)
    sigma, rho_tilde = grenier_density_sigma(fw, grid, sst, aux, chunk_cells=16)
    sst = sst.replace(rho=rho_tilde)
    out = compute_forces(fw, grid, sst, aux, chunk_cells=16, sigma=sigma)
    assert np.isfinite(np.asarray(out.DvDt)).all()
    assert np.isfinite(np.asarray(out.DrDt)).all()


def test_grenier_uniform_lattice_equilibrium(rng):
    """Uniform single-fluid lattice at rest: smoothed density = rho0, DJ/Dt=0,
    interior acceleration = gravity."""
    fw = grenier_fw()
    n = 16
    xs = (np.arange(n) + 0.5) * DP
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
    N = len(g)
    st = empty_state(N)
    st = st.replace(
        pos=jnp.asarray(g, jnp.float32),
        mass=jnp.full((N,), RHO0S[0] * DP**3, jnp.float32),
        info=jnp.full((N,), int(ParticleType.FLUID), jnp.uint32),
        extras={
            "grenier_J": jnp.zeros((N,), jnp.float32),
            "grenier_vol0": jnp.full((N,), DP**3, jnp.float32),
        },
    )
    grid = make_grid((0, 0, 0), (n * DP,) * 3, fw.influenceradius)
    sst, aux = build_cells(grid, st)
    sigma, rho_tilde = grenier_density_sigma(fw, grid, sst, aux, chunk_cells=16)
    sst = sst.replace(rho=rho_tilde)
    out = compute_forces(fw, grid, sst, aux, chunk_cells=16, sigma=sigma)

    # interior particles: full kernel support
    p = np.asarray(sst.pos)
    lo = 1.05 * fw.influenceradius
    hi = n * DP - 1.05 * fw.influenceradius
    interior = np.all((p > lo) & (p < hi), axis=1)
    assert interior.sum() > 20
    # uniform lattice: smoothed density == rho0 exactly (mass/corr cancels)
    np.testing.assert_allclose(np.asarray(rho_tilde)[interior], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.DrDt)[interior], 0.0, atol=1e-7)
    # acceleration: a deeper margin, outside the influence of particles whose
    # own support is truncated by the wall
    lo2, hi2 = 2.1 * fw.influenceradius, n * DP - 2.1 * fw.influenceradius
    deep = np.all((p > lo2) & (p < hi2), axis=1)
    assert deep.sum() > 20
    acc = np.asarray(out.DvDt)[deep]
    # f32 summation noise through the EOS leaves ~1e-3 m/s^2 residuals; a
    # formula error would show at the 1e-1 scale
    np.testing.assert_allclose(acc[:, :2], 0.0, atol=4e-3)
    np.testing.assert_allclose(acc[:, 2], -9.81, rtol=5e-4)


def test_lock_exchange_grenier_runs():
    """End-to-end: LockExchange with formulation=grenier integrates stably."""
    from gpusph_tpu.integrator import Simulator
    from gpusph_tpu.problems.base import get_problem

    P = get_problem("LockExchange")(dict(ppH=10, formulation="grenier"))
    assert P.fw.sph_formulation == SPHFormulation.SPH_GRENIER
    grid, state = P.build()
    sim = Simulator(P.fw, grid, use_pallas=False)
    state = sim.run(state, tend=0.0, maxiter=2 * P.fw.sp.buildneibsfreq)

    pos = np.asarray(state.pos)
    act = np.asarray(state.active)
    assert np.isfinite(pos[act]).all()
    J = np.asarray(state.extras["grenier_J"])[act]
    assert np.isfinite(J).all()
    assert np.abs(J).max() < 0.2  # weakly-compressible: |J| stays small
    rho = np.asarray(state.rho)[act]
    assert np.abs(rho).max() < 0.2

"""Hu & Adams (SPH_HA) formulation vs brute-force float64 reference."""
import numpy as np
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
from gpusph_tpu.ops.neighbors import build_cells, make_grid
from gpusph_tpu.state import empty_state

from reference_sph import brute_ha_forces

DP = 0.02
RHO0S = (1000.0, 1350.0)  # unequal rest densities -> unequal particle masses
C0S = (25.0, 25.0)
GAMMAS = (7.0, 7.0)


def make_two_fluid_scene(rng, n_fluid=180, n_bound=70, box=0.3):
    """Random two-fluid blob with per-fluid masses + boundary particles."""
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
    rho = np.zeros(capacity, np.float32)
    rho[:n] = rng.uniform(-0.004, 0.008, size=n)
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
    st = st.replace(
        pos=jnp.asarray(np.pad(pos, ((0, capacity - n), (0, 0)))),
        vel=jnp.asarray(vel),
        rho=jnp.asarray(rho),
        mass=jnp.asarray(mass),
        info=jnp.asarray(info),
    )
    return st, ptype, f_num


def run_ha_case(rng, *, kinvisc=0.0, artvisc=0.0, xi=0.0):
    fluids = tuple(
        Fluid(rho0=r, gamma=g, c0=c, kinematic_visc=kinvisc)
        for r, g, c in zip(RHO0S, GAMMAS, C0S)
    )
    fw = setup_framework(
        formulation=SPHFormulation.SPH_HA,
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
        ),
    ).finalize()

    st, ptype, f_num = make_two_fluid_scene(rng)
    grid = make_grid((0, 0, 0), (0.3, 0.3, 0.3), fw.influenceradius)
    sst, aux = build_cells(grid, st)
    out = compute_forces(fw, grid, sst, aux, chunk_cells=16)

    fn_s = np.asarray((np.asarray(sst.info) >> 16) & 0xFF, np.int64)
    act = np.asarray(sst.active)
    pt_s = np.where(act, np.asarray(np.asarray(sst.info) & 0x7, np.int64), 4)

    b_dv, b_dr = brute_ha_forces(
        np.asarray(sst.pos, np.float64),
        np.asarray(sst.vel, np.float64),
        np.asarray(sst.rho, np.float64),
        np.asarray(sst.mass, np.float64),
        pt_s,
        fn_s,
        h=fw.sp.slength,
        rho0s=RHO0S,
        c0s=C0S,
        gammas=GAMMAS,
        gravity=(0.0, 0.0, -9.81),
        artvisc_alpha=artvisc,
        epsartvisc=fw.pp.epsartvisc,
        kinviscs=((kinvisc,) * 2 if kinvisc > 0 else None),
        colagrossi_xi=xi,
    )
    scale = np.maximum(np.abs(b_dv).max(), 1.0)
    np.testing.assert_allclose(
        np.asarray(out.DvDt)[pt_s <= 1], b_dv[pt_s <= 1], atol=2e-4 * scale
    )
    dr_scale = np.maximum(np.abs(b_dr).max(), 1e-6)
    np.testing.assert_allclose(
        np.asarray(out.DrDt)[pt_s <= 1], b_dr[pt_s <= 1], atol=2e-4 * dr_scale
    )


def test_ha_pressure_only(rng):
    run_ha_case(rng)


def test_ha_artvisc(rng):
    run_ha_case(rng, artvisc=0.3)


def test_ha_morris_colagrossi(rng):
    run_ha_case(rng, kinvisc=1e-4, xi=0.1)


def test_ha_equal_mass_matches_f1_continuity(rng):
    """With a single fluid and equal masses, HA continuity m_a sum(v.r)F
    equals the standard m_b sum(v.r)F exactly."""
    from gpusph_tpu.ops.forces import compute_forces as cf

    def build(form):
        fw = setup_framework(
            formulation=form,
            boundary=BoundaryType.DYN_BOUNDARY,
            rheology=RheologyType.INVISCID,
            turbulence_model=TurbulenceModel.ARTIFICIAL,
            flags=SimFlags.ENABLE_DTADAPT,
            simparams=SimParams(deltap=DP, max_parts_per_cell=64),
            physparams=PhysParams(
                fluids=(Fluid(rho0=1000.0, gamma=7.0, c0=25.0),),
                gravity=(0.0, 0.0, -9.81),
            ),
        ).finalize()
        return fw

    rng2 = np.random.default_rng(7)
    st, ptype, _ = make_two_fluid_scene(rng2)
    # force single fluid: strip fluid bits, uniform mass
    info = np.asarray(st.info)
    info = info & np.uint32(0xFFFF)
    st = st.replace(
        info=jnp.asarray(info),
        mass=jnp.where(st.mass > 0, 1000.0 * DP**3, 0.0).astype(jnp.float32),
    )
    grid = make_grid((0, 0, 0), (0.3, 0.3, 0.3), 2 * 1.3 * DP)
    sst, aux = build_cells(grid, st)
    out_ha = cf(build(SPHFormulation.SPH_HA), grid, sst, aux, chunk_cells=16)
    out_f1 = cf(build(SPHFormulation.SPH_F1), grid, sst, aux, chunk_cells=16)
    np.testing.assert_allclose(
        np.asarray(out_ha.DrDt), np.asarray(out_f1.DrDt), rtol=1e-5, atol=1e-8
    )


def test_lock_exchange_ha_runs():
    """End-to-end: LockExchange with formulation=ha integrates stably."""
    from gpusph_tpu.integrator import Simulator
    from gpusph_tpu.problems.base import get_problem

    P = get_problem("LockExchange")(dict(ppH=10, formulation="ha"))
    assert P.fw.sph_formulation == SPHFormulation.SPH_HA
    grid, state = P.build()
    sim = Simulator(P.fw, grid, use_pallas=False)
    state = sim.run(state, tend=0.0, maxiter=2 * P.fw.sp.buildneibsfreq)

    act = np.asarray(state.active)
    assert np.isfinite(np.asarray(state.pos)[act]).all()
    rho = np.asarray(state.rho)[act]
    assert np.isfinite(rho).all() and np.abs(rho).max() < 0.2

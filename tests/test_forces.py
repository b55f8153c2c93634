"""Forces engine vs brute-force O(N^2) reference implementation."""
import numpy as np
import pytest
import jax.numpy as jnp

from gpusph_tpu import (
    BoundaryType,
    ViscousModel,
    DensityDiffusionType,
    Fluid,
    ParticleType,
    PhysParams,
    RheologyType,
    SimParams,
    TurbulenceModel,
    setup_framework,
)
from gpusph_tpu.ops.forces import compute_forces
from gpusph_tpu.ops.neighbors import build_cells, make_grid
from gpusph_tpu.state import empty_state, make_info

from reference_sph import brute_forces

H = 0.026  # slength for deltap=0.02, sfactor=1.3
DP = 0.02


def make_random_scene(rng, n_fluid=200, n_bound=80, box=0.3):
    """Random fluid blob + boundary particles, slightly perturbed density."""
    capacity = n_fluid + n_bound + 20
    st = empty_state(capacity)
    pos = np.concatenate(
        [
            rng.uniform(0.05, box - 0.05, size=(n_fluid, 3)),
            rng.uniform(0.0, box, size=(n_bound, 3)),
        ]
    ).astype(np.float32)
    vel = np.zeros((capacity, 3), np.float32)
    vel[:n_fluid] = rng.normal(0, 0.5, size=(n_fluid, 3))
    rho = np.zeros(capacity, np.float32)
    rho[: n_fluid + n_bound] = rng.uniform(-0.005, 0.01, size=n_fluid + n_bound)
    mass = np.full(capacity, 1000.0 * DP**3, np.float32)
    info = np.full(capacity, int(ParticleType.NONE), np.uint32)
    info[:n_fluid] = np.uint32(int(ParticleType.FLUID))
    info[n_fluid : n_fluid + n_bound] = np.uint32(int(ParticleType.BOUNDARY))
    ptype = np.full(capacity, 4, np.int32)
    ptype[:n_fluid] = 0
    ptype[n_fluid : n_fluid + n_bound] = 1
    st = st.replace(
        pos=jnp.asarray(pos if capacity == len(pos) else np.pad(pos, ((0, capacity - len(pos)), (0, 0)))),
        vel=jnp.asarray(vel),
        rho=jnp.asarray(rho),
        mass=jnp.asarray(mass),
        info=jnp.asarray(info),
    )
    return st, ptype


def run_case(rng, *, boundary, turb, kinvisc, diffusion, xi=0.0,
             visc_model=None, bulk_visc=0.0):
    extra = {"visc_model": visc_model} if visc_model is not None else {}
    fw = setup_framework(
        boundary=boundary,
        turbulence_model=turb,
        rheology=RheologyType.NEWTONIAN if kinvisc > 0 else RheologyType.INVISCID,
        density_diffusion=diffusion,
        simparams=SimParams(
            deltap=DP, max_parts_per_cell=64, densityDiffCoeff=xi if xi else float("nan")
        ),
        physparams=PhysParams(
            fluids=(Fluid(rho0=1000.0, gamma=7.0, c0=30.0,
                          kinematic_visc=kinvisc, bulk_visc=bulk_visc),),
            gravity=(0.0, 0.0, -9.81),
            dcoeff=50.0,
        ),
        **extra,
    ).finalize()

    st, _ = make_random_scene(rng)
    grid = make_grid((0, 0, 0), (0.3, 0.3, 0.3), fw.influenceradius)
    sorted_st, aux = build_cells(grid, st)

    out = compute_forces(fw, grid, sorted_st, aux, chunk_cells=16)

    act = np.asarray(sorted_st.active)
    ptype_sorted = np.where(
        np.asarray(sorted_st.info) & 7 == 0, 0, 1
    )  # fluid=0 else boundary (dead don't matter)

    ref_DvDt, ref_DrDt = brute_forces(
        np.asarray(sorted_st.pos)[act],
        np.asarray(sorted_st.vel)[act],
        np.asarray(sorted_st.rho)[act],
        np.asarray(sorted_st.mass)[act],
        ptype_sorted[act],
        h=fw.slength,
        rho0=1000.0,
        c0=30.0,
        gamma=7.0,
        gravity=np.array([0.0, 0.0, -9.81]),
        boundary="dyn" if boundary == BoundaryType.DYN_BOUNDARY else "lj",
        artvisc_alpha=0.3 if turb == TurbulenceModel.ARTIFICIAL else 0.0,
        epsartvisc=fw.pp.epsartvisc,
        kinvisc=kinvisc,
        visc_model=(
            "espanol_revenga"
            if visc_model == ViscousModel.ESPANOL_REVENGA else "morris"
        ),
        bulk_visc=bulk_visc,
        lj_d=50.0,
        lj_r0=fw.pp.r0,
        colagrossi_xi=xi,
    )
    got_DvDt = np.asarray(out.DvDt)[act]
    got_DrDt = np.asarray(out.DrDt)[act]

    scale_v = max(1.0, np.abs(ref_DvDt).max())
    scale_r = max(1e-3, np.abs(ref_DrDt).max())
    np.testing.assert_allclose(got_DvDt, ref_DvDt, atol=2e-4 * scale_v)
    np.testing.assert_allclose(got_DrDt, ref_DrDt, atol=2e-4 * scale_r)


def test_dyn_artvisc(rng):
    run_case(rng, boundary=BoundaryType.DYN_BOUNDARY,
             turb=TurbulenceModel.ARTIFICIAL, kinvisc=0.0,
             diffusion=DensityDiffusionType.NONE)


def test_lj_artvisc(rng):
    run_case(rng, boundary=BoundaryType.LJ_BOUNDARY,
             turb=TurbulenceModel.ARTIFICIAL, kinvisc=0.0,
             diffusion=DensityDiffusionType.NONE)


def test_dyn_laminar(rng):
    run_case(rng, boundary=BoundaryType.DYN_BOUNDARY,
             turb=TurbulenceModel.LAMINAR_FLOW, kinvisc=1e-4,
             diffusion=DensityDiffusionType.NONE)


def test_dyn_colagrossi(rng):
    run_case(rng, boundary=BoundaryType.DYN_BOUNDARY,
             turb=TurbulenceModel.ARTIFICIAL, kinvisc=0.0,
             diffusion=DensityDiffusionType.COLAGROSSI, xi=0.1)


def test_dyn_espanol_revenga(rng):
    """Espanol & Revenga viscous model (volumic term, forces_kernel.def:2650)."""
    run_case(rng, boundary=BoundaryType.DYN_BOUNDARY,
             turb=TurbulenceModel.LAMINAR_FLOW, kinvisc=1e-4,
             diffusion=DensityDiffusionType.NONE,
             visc_model=ViscousModel.ESPANOL_REVENGA, bulk_visc=0.05)

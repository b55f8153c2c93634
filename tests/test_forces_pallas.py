"""Pallas forces kernel vs the (brute-force-validated) XLA forces path."""
import numpy as np
import pytest
import jax.numpy as jnp

from gpusph_tpu import (
    BoundaryType,
    DensityDiffusionType,
    Fluid,
    PhysParams,
    RheologyType,
    SimParams,
    TurbulenceModel,
    setup_framework,
)
from gpusph_tpu.ops.forces import compute_forces
from gpusph_tpu.ops.forces_pallas import compute_forces_pallas, pallas_supported
from gpusph_tpu.ops.neighbors import build_cells, make_grid

from test_forces import make_random_scene, DP


def compare(rng, *, boundary, turb, kinvisc, diffusion, xi=0.0):
    fw = setup_framework(
        boundary=boundary,
        turbulence_model=turb,
        rheology=RheologyType.NEWTONIAN if kinvisc > 0 else RheologyType.INVISCID,
        density_diffusion=diffusion,
        simparams=SimParams(
            deltap=DP, max_parts_per_cell=32,
            densityDiffCoeff=xi if xi else float("nan"),
        ),
        physparams=PhysParams(
            fluids=(Fluid(rho0=1000.0, gamma=7.0, c0=30.0, kinematic_visc=kinvisc),),
            gravity=(0.0, 0.0, -9.81),
            dcoeff=50.0,
        ),
    ).finalize()

    st, _ = make_random_scene(rng, n_fluid=150, n_bound=60)
    grid = make_grid((0, 0, 0), (0.3, 0.3, 0.3), fw.influenceradius)
    assert pallas_supported(fw, grid)
    sorted_st, aux = build_cells(grid, st)

    ref = compute_forces(fw, grid, sorted_st, aux, chunk_cells=16)
    got = compute_forces_pallas(fw, grid, sorted_st, aux)

    act = np.asarray(sorted_st.active)
    # mixed tolerance: LJ forces near the singularity are astronomically
    # large, so allow a small relative error on top of the absolute one
    np.testing.assert_allclose(
        np.asarray(got.DvDt)[act], np.asarray(ref.DvDt)[act], rtol=2e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.DrDt)[act], np.asarray(ref.DrDt)[act], rtol=2e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        float(got.max_accel), float(ref.max_accel), rtol=2e-3
    )


def test_pallas_dyn_artvisc(rng):
    compare(rng, boundary=BoundaryType.DYN_BOUNDARY,
            turb=TurbulenceModel.ARTIFICIAL, kinvisc=0.0,
            diffusion=DensityDiffusionType.NONE)


def test_pallas_lj(rng):
    compare(rng, boundary=BoundaryType.LJ_BOUNDARY,
            turb=TurbulenceModel.ARTIFICIAL, kinvisc=0.0,
            diffusion=DensityDiffusionType.NONE)


def test_pallas_laminar(rng):
    compare(rng, boundary=BoundaryType.DYN_BOUNDARY,
            turb=TurbulenceModel.LAMINAR_FLOW, kinvisc=1e-4,
            diffusion=DensityDiffusionType.NONE)


def test_pallas_colagrossi(rng):
    compare(rng, boundary=BoundaryType.DYN_BOUNDARY,
            turb=TurbulenceModel.ARTIFICIAL, kinvisc=0.0,
            diffusion=DensityDiffusionType.COLAGROSSI, xi=0.1)


def test_pallas_xsph(rng):
    import jax.numpy as jnp
    from gpusph_tpu import SimFlags
    from gpusph_tpu.ops.neighbors import build_cells

    fw = setup_framework(
        boundary=BoundaryType.DYN_BOUNDARY,
        turbulence_model=TurbulenceModel.ARTIFICIAL,
        rheology=RheologyType.INVISCID,
        flags=SimFlags.ENABLE_DTADAPT | SimFlags.ENABLE_XSPH,
        simparams=SimParams(deltap=DP, max_parts_per_cell=32),
        physparams=PhysParams(
            fluids=(Fluid(rho0=1000.0, gamma=7.0, c0=30.0),),
            gravity=(0.0, 0.0, -9.81),
        ),
    ).finalize()
    st, _ = make_random_scene(rng, n_fluid=150, n_bound=60)
    grid = make_grid((0, 0, 0), (0.3, 0.3, 0.3), fw.influenceradius)
    assert pallas_supported(fw, grid)
    sorted_st, aux = build_cells(grid, st)
    ref = compute_forces(fw, grid, sorted_st, aux, chunk_cells=16)
    got = compute_forces_pallas(fw, grid, sorted_st, aux)
    act = np.asarray(sorted_st.active)
    np.testing.assert_allclose(
        np.asarray(got.xsph)[act], np.asarray(ref.xsph)[act], rtol=2e-3, atol=1e-7
    )


def test_pallas_internal_energy(rng):
    import jax.numpy as jnp
    from gpusph_tpu import SimFlags
    from gpusph_tpu.ops.neighbors import build_cells

    fw = setup_framework(
        boundary=BoundaryType.DYN_BOUNDARY,
        turbulence_model=TurbulenceModel.ARTIFICIAL,
        rheology=RheologyType.INVISCID,
        flags=SimFlags.ENABLE_DTADAPT | SimFlags.ENABLE_INTERNAL_ENERGY,
        simparams=SimParams(deltap=DP, max_parts_per_cell=32),
        physparams=PhysParams(
            fluids=(Fluid(rho0=1000.0, gamma=7.0, c0=30.0),),
            gravity=(0.0, 0.0, -9.81),
        ),
    ).finalize()
    st, _ = make_random_scene(rng, n_fluid=150, n_bound=60)
    grid = make_grid((0, 0, 0), (0.3, 0.3, 0.3), fw.influenceradius)
    sorted_st, aux = build_cells(grid, st)
    ref = compute_forces(fw, grid, sorted_st, aux, chunk_cells=16)
    got = compute_forces_pallas(fw, grid, sorted_st, aux)
    act = np.asarray(sorted_st.active)
    assert np.abs(np.asarray(ref.DEDt)[act]).max() > 0  # nonzero physics
    np.testing.assert_allclose(
        np.asarray(got.DEDt)[act], np.asarray(ref.DEDt)[act], rtol=2e-3,
        atol=1e-5 * np.abs(np.asarray(ref.DEDt)[act]).max(),
    )

"""Density summation + dynamic gamma (ops/density_sum.py) vs invariants and
the quadrature oracle.

Reference semantics: `src/cuda/density_sum_kernel.cu` (volumic :200-255,
boundary :422-483, update :606-655, integrateGamma :669-684).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpusph_tpu.defs import ParticleType, SimFlags
from gpusph_tpu.ops.density_sum import (
    density_sum_update,
    init_dynamic_gamma,
    integrate_gamma,
)
from gpusph_tpu.ops.neighbors import build_cells
from gpusph_tpu.ops.sa import compute_gamma
from gpusph_tpu.problems.base import get_problem
from gpusph_tpu.state import part_type


@pytest.fixture(scope="module")
def sa_setup():
    P = get_problem("StillWaterSA")(dict(ppH=8, density_sum=1))
    grid, state = P.build()
    fw = P.fw.finalize()
    state, aux = jax.jit(lambda s: build_cells(grid, s))(state)
    state = init_dynamic_gamma(fw, grid, state, aux)
    return fw, grid, state, aux


def test_init_gamma_matches_quadrature(sa_setup):
    fw, grid, state, aux = sa_setup
    gam_q, gg_q = compute_gamma(fw, grid, state, aux)
    np.testing.assert_allclose(
        np.asarray(state.extras["gamma"]), np.asarray(gam_q), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(state.extras["gradgamma"]), np.asarray(gg_q), atol=1e-6
    )


def test_static_density_sum_identity(sa_setup):
    """No motion => kernel sums cancel, gamma unchanged, density unchanged."""
    fw, grid, state, aux = sa_setup
    new = density_sum_update(fw, grid, state, state, aux, jnp.float32(1e-4))
    act = np.asarray(state.active)
    np.testing.assert_allclose(
        np.asarray(new.rho)[act], np.asarray(state.rho)[act], atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(new.extras["gamma"])[act],
        np.asarray(state.extras["gamma"])[act],
        atol=1e-6,
    )


def test_integrate_gamma_tracks_quadrature(sa_setup):
    """Trapezoidal gamma integration along a rigid fluid displacement must
    track the quadrature value at the displaced position."""
    fw, grid, state, aux = sa_setup
    dp = fw.sp.deltap
    is_fluid = np.asarray(part_type(state.info)) == int(ParticleType.FLUID)
    act = np.asarray(state.active) & is_fluid

    nsub = 8
    dz = -0.3 * dp  # toward the bottom wall
    step = jnp.asarray([0.0, 0.0, dz / nsub], jnp.float32)

    cur = state
    for _ in range(nsub):
        newpos = jnp.where(
            jnp.asarray(act)[:, None], cur.pos + step[None, :], cur.pos
        )
        new = cur.replace(pos=newpos)
        new = integrate_gamma(fw, grid, cur, new, aux, jnp.float32(0.0))
        cur = new

    gam_int = np.asarray(cur.extras["gamma"])
    gam_quad, _ = compute_gamma(fw, grid, cur, aux)
    gam_quad = np.asarray(gam_quad)
    # compare on fluid rows that actually see a wall (gamma < 0.999)
    sel = act & (gam_quad < 0.999)
    assert sel.sum() > 10
    np.testing.assert_allclose(gam_int[sel], gam_quad[sel], atol=5e-3)


def test_stillwater_sa_density_sum_chunk():
    """End-to-end: the density-sum chunk runs and stays finite/sane."""
    from gpusph_tpu.integrator import Simulator

    P = get_problem("StillWaterSA")(dict(ppH=8, density_sum=1))
    grid, state = P.build()
    fw = P.fw.finalize()
    assert fw.flags & SimFlags.ENABLE_DENSITY_SUM
    assert fw.dynamic_gamma
    sim = Simulator(fw, grid)
    state = sim.run(state, maxiter=2 * fw.sp.buildneibsfreq)
    act = np.asarray(state.active)
    rho = np.asarray(state.rho)[act]
    assert np.isfinite(rho).all()
    assert np.abs(rho).max() < 0.2  # relative density stays near rest
    gam = np.asarray(state.extras["gamma"])[act]
    assert (gam >= 0.1 - 1e-6).all() and (gam <= 1.0 + 1e-6).all()

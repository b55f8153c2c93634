"""Geometric plane boundary forces (ENABLE_PLANES)."""
import numpy as np
import jax.numpy as jnp

from gpusph_tpu import (
    BoundaryType, Fluid, ParticleType, PhysParams, RheologyType, SimParams,
    TurbulenceModel, setup_framework,
)
from gpusph_tpu.ops.planes import apply_plane_forces
from gpusph_tpu.framework import SimFramework
import dataclasses


def test_plane_repels_approaching_particle():
    fw = setup_framework(
        boundary=BoundaryType.LJ_BOUNDARY,
        simparams=SimParams(deltap=0.02),
        physparams=PhysParams(
            fluids=(Fluid(rho0=1000.0, c0=20.0),), dcoeff=100.0
        ),
    )
    fw = dataclasses.replace(
        fw, planes=(((0.0, 0.0, 0.0), (0.0, 0.0, 1.0)),)
    ).finalize()

    pos = jnp.asarray([[0.5, 0.5, 0.01], [0.5, 0.5, 0.1]], jnp.float32)
    vel = jnp.zeros((2, 3), jnp.float32)
    mass = jnp.full(2, 8e-3, jnp.float32)
    is_fluid = jnp.asarray([True, True])
    dv = apply_plane_forces(fw, pos, vel, mass, is_fluid, jnp.zeros((2, 3)))
    dv = np.asarray(dv)
    # particle inside r0 gets pushed up, the far one is untouched
    assert dv[0, 2] > 0.0
    np.testing.assert_allclose(dv[1], 0.0, atol=1e-8)


def test_dambreak_use_planes_runs():
    from gpusph_tpu.integrator import Simulator
    from gpusph_tpu.problems.base import get_problem

    P = get_problem("DamBreak3D")(dict(deltap=0.04, use_planes=True))
    grid, state = P.build()
    assert P.fw.planes  # six container planes
    sim = Simulator(P.fw, grid, use_pallas=False, bodies_specs=P.body_specs())
    st = sim.run(state, tend=0.0, maxiter=10)
    assert not bool(jnp.any(jnp.isnan(st.pos)))
    # no particle fell below the floor plane
    act = np.asarray(st.active)
    assert np.asarray(st.pos)[act, 2].min() > -0.05

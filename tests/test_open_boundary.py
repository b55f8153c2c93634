"""Open-boundary (inlet/outlet) tests.

Covers the TPU-native IO pipeline (reference
`boundary_conditions_kernel.cu` IO branches + host-side creation cadence,
`engine_boundary_conditions.h:102-150`): velocity imposition on
FG_VELOCITY_DRIVEN rows, outflow deactivation, and host-side inlet
particle creation from the vertex-mass flux accumulator.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from gpusph_tpu.defs import ParticleType
from gpusph_tpu.ops.io_boundary import (
    IOSpec,
    impose_io_values,
    inlet_create_host,
    kill_outflow,
)
from gpusph_tpu.problems.base import get_problem
from gpusph_tpu.state import (
    FG_INACTIVE,
    FG_INLET,
    FG_VELOCITY_DRIVEN,
    empty_state,
    has_flag,
    part_type,
)


def _mini_state(fw):
    """Tiny synthetic state: 2 fluid, 1 inlet vertex, 1 inlet segment,
    rest empty."""
    cap = 8
    extras = {"belem": jnp.zeros((cap, 3), jnp.float32)}
    st = empty_state(cap, extras)
    info = np.full(cap, int(ParticleType.NONE), np.uint32)
    pos = np.zeros((cap, 3), np.float32)
    mass = np.zeros(cap, np.float32)
    rho = np.full(cap, 1000.0, np.float32)
    dp = fw.sp.deltap
    info[0] = int(ParticleType.FLUID)
    info[1] = int(ParticleType.FLUID)
    pos[0] = (0.5, 0.0, 0.0)
    pos[1] = (2.5, 0.0, 0.0)  # beyond the outflow plane x=2
    info[2] = int(ParticleType.VERTEX) | FG_INLET | FG_VELOCITY_DRIVEN
    info[3] = int(ParticleType.BOUNDARY) | FG_INLET | FG_VELOCITY_DRIVEN
    pos[2] = (0.0, 0.0, 0.0)
    pos[3] = (0.0, 0.1, 0.1)
    # vertex mass encodes a dp x dp owned area (plate convention
    # m = rho0 * area * dp / 2)
    mass[2] = 1000.0 * dp * dp * dp / 2
    belem = np.zeros((cap, 3), np.float32)
    belem[2] = belem[3] = (1.0, 0.0, 0.0)  # inward +x
    return st.replace(
        info=jnp.asarray(info), pos=jnp.asarray(pos),
        mass=jnp.asarray(mass), rho=jnp.asarray(rho),
        extras={"belem": jnp.asarray(belem)},
    )


@pytest.fixture(scope="module")
def fw():
    P = get_problem("ChannelIO")(dict(deltap=0.1))
    return P.fw.finalize()


def test_impose_velocity(fw):
    st = _mini_state(fw)
    io = IOSpec(imposed_vel=lambda pos, t: jnp.full_like(pos, 0.7))
    out = impose_io_values(fw, io, st, jnp.float32(0.0))
    v = np.asarray(out.vel)
    # IO wall rows take the imposed velocity; fluid rows don't
    assert np.allclose(v[2], 0.7) and np.allclose(v[3], 0.7)
    assert np.allclose(v[0], 0.0)


def test_kill_outflow(fw):
    st = _mini_state(fw)
    io = IOSpec(outflow=lambda pos: pos[:, 0] > 2.0)
    out = kill_outflow(io, st)
    info = np.asarray(out.info)
    assert has_flag(info[1], FG_INACTIVE)
    assert not has_flag(info[0], FG_INACTIVE)
    # walls are never deactivated, whatever their position
    assert not has_flag(info[2], FG_INACTIVE)


def test_inlet_creation(fw):
    st = _mini_state(fw)
    dp = fw.sp.deltap
    u = 1.0
    io = IOSpec(imposed_vel=lambda pos, t: jnp.stack(
        [jnp.full(pos.shape[0], u)] + [jnp.zeros(pos.shape[0])] * 2, axis=-1))
    vmass = np.zeros(st.capacity)
    # flux per step = rho0 * u * area * dt; area = dp^2, m0 = rho0 dp^3
    # -> dt = dp/u fills exactly one reference mass
    st2, vmass, next_id, n_new = inlet_create_host(
        fw, io, st, vmass, dt_chunk=0.6 * dp / u, t=0.0, next_id=100)
    assert n_new == 1  # 0.6 m0 accumulated > 0.5 m0 threshold
    info = np.asarray(st2.info)
    created = np.asarray(st2.id) == 100
    assert created.sum() == 1
    k = int(np.nonzero(created)[0][0])
    assert part_type(info[k]) == ParticleType.FLUID
    # spawned half a dp inside along the inward normal
    assert np.allclose(np.asarray(st2.pos)[k], (0.5 * dp, 0.0, 0.0), atol=1e-6)
    assert np.isclose(float(np.asarray(st2.mass)[k]), 1000.0 * dp**3)
    # accumulator decremented by the reference mass
    assert vmass[2] == pytest.approx(0.6 * 1000.0 * dp**3 - 1000.0 * dp**3)
    # below threshold: no further creation
    st3, vmass, next_id, n_new = inlet_create_host(
        fw, io, st2, vmass, dt_chunk=0.0, t=0.0, next_id=next_id)
    assert n_new == 0


def test_channelio_builds():
    P = get_problem("ChannelIO")(dict(deltap=0.05))
    grid, state = P.build()
    info = np.asarray(state.info)
    assert int(has_flag(info, FG_INLET).sum()) > 0
    assert int(has_flag(info, jnp.uint32(1 << 7)).sum()) >= 0  # smoke
    # reserve slots exist for inlet-created particles
    assert state.capacity > int(state.count_active())
    assert P.fw.io is not None and P.fw.io.imposed_vel is not None

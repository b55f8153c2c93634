"""Moving/floating body tests."""
import numpy as np
import pytest
import jax.numpy as jnp

from gpusph_tpu.bodies import (
    BodySpec,
    apply_body_motion,
    init_bodies_state,
    reduce_body_forces,
    step_bodies,
)
from gpusph_tpu.state import (
    FG_COMPUTE_FORCE,
    FG_MOVING_BOUNDARY,
    ParticleType,
    empty_state,
)


def body_scene():
    """Four boundary particles of body 1 in a square around (0,0,0)."""
    st = empty_state(6)
    pos = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [5, 5, 5], [0, 0, 0]],
        np.float32,
    )
    info = np.zeros(6, np.uint32)
    info[:4] = (
        np.uint32(int(ParticleType.BOUNDARY))
        | np.uint32(FG_MOVING_BOUNDARY | FG_COMPUTE_FORCE)
        | (np.uint32(1) << 16)
    )
    info[4] = np.uint32(int(ParticleType.FLUID))
    info[5] = np.uint32(int(ParticleType.NONE))
    return st.replace(
        pos=jnp.asarray(pos),
        mass=jnp.ones(6, jnp.float32),
        info=jnp.asarray(info),
    )


def test_cg_and_force_reduction():
    st = body_scene()
    spec = BodySpec(object_idx=1, mass=4.0, floating=True)
    bodies = init_bodies_state([spec], st)
    np.testing.assert_allclose(np.asarray(bodies.cg)[1], [0, 0, 0], atol=1e-6)

    # uniform acceleration on body particles -> force = sum m*a, zero torque
    DvDt = jnp.broadcast_to(jnp.asarray([1.0, 0, 0]), (6, 3))
    b = reduce_body_forces([spec], st, DvDt, bodies)
    np.testing.assert_allclose(np.asarray(b.force)[1], [4.0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(b.torque)[1], [0, 0, 0], atol=1e-6)

    # tangential acceleration -> pure torque about z
    pos = np.asarray(st.pos)
    tang = np.stack([-pos[:, 1], pos[:, 0], 0 * pos[:, 2]], 1)
    b2 = reduce_body_forces([spec], st, jnp.asarray(tang), bodies)
    np.testing.assert_allclose(np.asarray(b2.force)[1], [0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(b2.torque)[1], [0, 0, 4.0], atol=1e-6)


def test_prescribed_motion_translation():
    st = body_scene()
    spec = BodySpec(
        object_idx=1,
        motion=lambda t: (jnp.asarray([1.0, 0, 0]), jnp.zeros(3)),
    )
    bodies = init_bodies_state([spec], st)
    bodies = step_bodies([spec], bodies, (0, 0, 0), jnp.float32(0.0), jnp.float32(0.1))
    new = apply_body_motion([spec], st, bodies, jnp.float32(0.1))
    # body particles moved +0.1 in x, fluid particle untouched
    np.testing.assert_allclose(
        np.asarray(new.pos)[0], [1.1, 0, 0], atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(new.pos)[4], [5, 5, 5], atol=1e-6)
    np.testing.assert_allclose(np.asarray(new.vel)[0], [1, 0, 0], atol=1e-6)


def test_prescribed_rotation():
    st = body_scene()
    omega = 2.0
    spec = BodySpec(
        object_idx=1,
        motion=lambda t: (jnp.zeros(3), jnp.asarray([0.0, 0, omega])),
        rotation_center=(0.0, 0.0, 0.0),
    )
    bodies = init_bodies_state([spec], st)
    dt = 0.05
    bodies = step_bodies([spec], bodies, (0, 0, 0), jnp.float32(0.0), jnp.float32(dt))
    new = apply_body_motion([spec], st, bodies, jnp.float32(dt))
    th = omega * dt
    np.testing.assert_allclose(
        np.asarray(new.pos)[0], [np.cos(th), np.sin(th), 0], atol=1e-6
    )
    # |v| = omega * r
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(new.vel)[0]), omega, atol=1e-5
    )


def test_floating_free_fall():
    st = body_scene()
    spec = BodySpec(object_idx=1, mass=4.0, floating=True)
    bodies = init_bodies_state([spec], st)
    g = (0.0, 0.0, -10.0)
    dt = 0.1
    bodies = step_bodies([spec], bodies, g, jnp.float32(0.0), jnp.float32(dt))
    np.testing.assert_allclose(np.asarray(bodies.linvel)[1], [0, 0, -1.0], atol=1e-6)
    new = apply_body_motion([spec], st, bodies, jnp.float32(dt))
    np.testing.assert_allclose(np.asarray(new.pos)[0, 2], -0.1, atol=1e-6)

"""Moving & floating rigid bodies.

TPU-native counterpart of the reference's moving-body machinery: the
moving-body registry and callbacks (`ProblemCore::add_moving_body`
`src/ProblemCore.h:542`, `moving_bodies_callback`), the per-body force/torque
segmented reduction (REDUCE_BODIES_FORCES, `src/engine_forces.h:78-84`), the
host-side 6-DOF integration / prescribed kinematics (MOVE_BODIES,
`src/GPUSPH.cc:802-830`) and the rigid rototranslation applied to body
particles inside the euler kernel (`src/cuda/euler_kernel.def:474-510`).

Design: bodies are a small fixed-count pytree (`BodiesState`) threaded
through the jitted step; prescribed motions are *traceable* callbacks
``motion(t) -> (linvel[3], angvel[3])`` baked into the trace; floating
bodies integrate Newton-Euler from the fluid forces reduced with
``segment_sum`` over the particle object numbers.  Particle updates apply
``v = v_cg + omega x r`` and an exact axis-angle rotation about the center
of gravity each step.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from .state import (
    FG_COMPUTE_FORCE,
    FG_MOVING_BOUNDARY,
    ParticleState,
    has_flag,
    object_num,
)


@dataclasses.dataclass(frozen=True)
class BodySpec:
    """Static description of one rigid body (object_idx >= 1)."""

    object_idx: int
    mass: float = 1.0
    inertia: Tuple[float, float, float] = (1.0, 1.0, 1.0)  # principal, body frame ~ world v1
    floating: bool = False
    # traceable prescribed kinematics: motion(t) -> (linvel[3], angvel[3]);
    # ignored for floating bodies
    motion: Optional[Callable] = None
    # hinge / rotation center; None -> use center of gravity of particles
    rotation_center: Optional[Tuple[float, float, float]] = None


class BodiesState(struct.PyTreeNode):
    """Dynamic state of all bodies; row 0 is a zero 'no body' slot."""

    cg: jax.Array  # f32[NB+1,3] rotation/force reference point
    linvel: jax.Array  # f32[NB+1,3]
    angvel: jax.Array  # f32[NB+1,3]
    force: jax.Array  # f32[NB+1,3] last reduced fluid force
    torque: jax.Array  # f32[NB+1,3]


def init_bodies_state(specs: Sequence[BodySpec], state: ParticleState) -> BodiesState:
    """Initial body state; cg from particle masses unless a hinge is given."""
    nb = len(specs)
    import numpy as np

    cg = np.zeros((nb + 1, 3), np.float32)
    obj = np.asarray(object_num(state.info))
    moving = np.asarray(has_flag(state.info, FG_MOVING_BOUNDARY))
    pos = np.asarray(state.pos)
    mass = np.asarray(state.mass)
    for s in specs:
        if s.rotation_center is not None:
            cg[s.object_idx] = s.rotation_center
        else:
            sel = moving & (obj == s.object_idx)
            m = mass[sel]
            if len(m):
                cg[s.object_idx] = (pos[sel] * m[:, None]).sum(0) / m.sum()
    z = jnp.zeros((nb + 1, 3), jnp.float32)
    return BodiesState(cg=jnp.asarray(cg), linvel=z, angvel=z, force=z, torque=z)


def reduce_body_forces(
    specs: Sequence[BodySpec],
    state: ParticleState,
    DvDt: jax.Array,
    bodies: BodiesState,
) -> BodiesState:
    """Per-body fluid force/torque from the boundary particles' hydrodynamic
    accelerations (REDUCE_BODIES_FORCES; reference sums rbforces/rbtorques
    per object, `src/GPUSPH.cc:802-830`)."""
    nb = len(specs)
    obj = object_num(state.info)
    contributes = has_flag(state.info, FG_COMPUTE_FORCE) & has_flag(
        state.info, FG_MOVING_BOUNDARY
    )
    seg = jnp.where(contributes, obj, 0)
    f = jnp.where(contributes[:, None], DvDt * state.mass[:, None], 0.0)
    force = jax.ops.segment_sum(f, seg, num_segments=nb + 1)
    arm = state.pos - bodies.cg[seg]
    tq = jnp.where(contributes[:, None], jnp.cross(arm, f), 0.0)
    torque = jax.ops.segment_sum(tq, seg, num_segments=nb + 1)
    return bodies.replace(force=force, torque=torque)


def step_bodies(
    specs: Sequence[BodySpec],
    bodies: BodiesState,
    gravity: Tuple[float, float, float],
    t,
    dt,
) -> BodiesState:
    """MOVE_BODIES: prescribed kinematics or Newton-Euler integration."""
    nb = len(specs)
    linvel = bodies.linvel
    angvel = bodies.angvel
    g = jnp.asarray(gravity, jnp.float32)
    for s in specs:
        i = s.object_idx
        if s.floating:
            acc = bodies.force[i] / s.mass + g
            inv_I = 1.0 / jnp.asarray(s.inertia, jnp.float32)
            linvel = linvel.at[i].set(linvel[i] + acc * dt)
            angvel = angvel.at[i].set(angvel[i] + inv_I * bodies.torque[i] * dt)
        elif s.motion is not None:
            lv, av = s.motion(t)
            linvel = linvel.at[i].set(jnp.asarray(lv, jnp.float32))
            angvel = angvel.at[i].set(jnp.asarray(av, jnp.float32))
        # bodies without motion stay fixed (feedback-only obstacles)
    cg = bodies.cg + linvel * dt
    return bodies.replace(cg=cg, linvel=linvel, angvel=angvel)


def _axis_angle_rotate(v, axis_angle):
    """Rodrigues rotation of vectors v [N,3] by per-row axis-angle [N,3]."""
    theta = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    safe = jnp.maximum(theta, 1e-12)
    k = axis_angle / safe
    c = jnp.cos(theta)
    s = jnp.sin(theta)
    kxv = jnp.cross(k, v)
    kdotv = jnp.sum(k * v, axis=-1, keepdims=True)
    rot = v * c + kxv * s + k * kdotv * (1.0 - c)
    return jnp.where(theta > 1e-12, rot, v)


def apply_body_motion(
    specs: Sequence[BodySpec],
    state: ParticleState,
    bodies: BodiesState,
    dt,
) -> ParticleState:
    """Rigid rototranslation of body particles over one (sub)step
    (`euler_kernel.def:474-510`): rotate about cg by omega*dt, translate by
    v_cg*dt, set particle velocity to v_cg + omega x r."""
    if not specs:
        return state
    obj = object_num(state.info)
    moving = has_flag(state.info, FG_MOVING_BOUNDARY)
    seg = jnp.where(moving, obj, 0)

    cg = bodies.cg[seg]
    lv = bodies.linvel[seg]
    av = bodies.angvel[seg]

    rel = state.pos - cg
    rel_rot = _axis_angle_rotate(rel, av * dt)
    new_pos = cg + lv * dt + rel_rot
    new_vel = lv + jnp.cross(av, rel_rot)

    m = moving[:, None]
    return state.replace(
        pos=jnp.where(m, new_pos, state.pos),
        vel=jnp.where(m, new_vel, state.vel),
    )


__all__ = [
    "BodySpec",
    "BodiesState",
    "init_bodies_state",
    "reduce_body_forces",
    "step_bodies",
    "apply_body_motion",
]

"""Moving & floating rigid bodies (quaternion 6-DOF).

TPU-native counterpart of the reference's moving-body machinery: the
moving-body registry and callbacks (`ProblemCore::add_moving_body`
`src/ProblemCore.h:542`, `moving_bodies_callback`), the per-body force/torque
segmented reduction (REDUCE_BODIES_FORCES, `src/engine_forces.h:78-84`), the
host-side 6-DOF integration (MOVE_BODIES, `src/GPUSPH.cc:802-830`; the
reference delegates dynamics to Chrono, `src/ProblemCore.cc:188-213` — here
Newton-Euler with a body-frame inertia tensor is integrated in-trace) and the
rigid rototranslation applied to body particles inside the euler kernel
(`src/cuda/euler_kernel.def:474-510`).

Design: bodies are a small fixed-count pytree (`BodiesState`) threaded
through the jitted step, carrying a unit quaternion orientation so the
Euler equations are solved in the body (principal) frame:

    I dw_b/dt + w_b x (I w_b) = R^T tau_world

Prescribed motions are *traceable* callbacks ``motion(t) -> (linvel[3],
angvel[3])`` baked into the trace; floating bodies integrate Newton-Euler
from the fluid forces reduced with ``segment_sum`` over the particle object
numbers.  Particle updates apply ``v = v_cg + omega x r`` and an exact
axis-angle rotation about the center of gravity each (sub)step.
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
    """Static description of one rigid body (object_idx >= 1).

    ``inertia`` is the principal (body-frame) inertia tensor diagonal; the
    body frame initially coincides with the world frame (pass a pre-rotated
    diagonal for tilted bodies).
    """

    object_idx: int
    mass: float = 1.0
    inertia: Tuple[float, float, float] = (1.0, 1.0, 1.0)
    floating: bool = False
    # traceable prescribed kinematics: motion(t) -> (linvel[3], angvel[3]);
    # ignored for floating bodies
    motion: Optional[Callable] = None
    # hinge / rotation center; None -> use center of gravity of particles
    rotation_center: Optional[Tuple[float, float, float]] = None


class BodiesState(struct.PyTreeNode):
    """Dynamic state of all bodies; row 0 is a zero 'no body' slot."""

    cg: jax.Array  # f32[NB+1,3] rotation/force reference point
    quat: jax.Array  # f32[NB+1,4] world<-body orientation (w,x,y,z)
    linvel: jax.Array  # f32[NB+1,3]
    angvel: jax.Array  # f32[NB+1,3] world frame
    force: jax.Array  # f32[NB+1,3] last reduced fluid force
    torque: jax.Array  # f32[NB+1,3]


# --- quaternion helpers (w,x,y,z convention, like EulerParameters
#     src/geometries/EulerParameters.h) -------------------------------------

def quat_mul(a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_from_axis_angle(aa):
    """Unit quaternion from axis-angle vectors [...,3]."""
    theta = jnp.linalg.norm(aa, axis=-1, keepdims=True)
    safe = jnp.maximum(theta, 1e-12)
    half = 0.5 * theta
    xyz = aa / safe * jnp.sin(half)
    w = jnp.cos(half)
    q = jnp.concatenate([w, xyz], axis=-1)
    ident = jnp.concatenate(
        [jnp.ones_like(w), jnp.zeros_like(xyz)], axis=-1
    )
    return jnp.where(theta > 1e-12, q, ident)


def quat_rotate(q, v):
    """Rotate vectors v [...,3] by quaternions q [...,4] (world <- body)."""
    w = q[..., 0:1]
    u = q[..., 1:4]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q, v):
    """Rotate by the conjugate (body <- world)."""
    qc = jnp.concatenate([q[..., 0:1], -q[..., 1:4]], axis=-1)
    return quat_rotate(qc, v)


def identity_quat(n):
    q = jnp.zeros((n, 4), jnp.float32)
    return q.at[:, 0].set(1.0)


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
    return BodiesState(
        cg=jnp.asarray(cg),
        quat=identity_quat(nb + 1),
        linvel=z,
        angvel=z,
        force=z,
        torque=z,
    )


def reduce_body_forces(
    specs: Sequence[BodySpec],
    state: ParticleState,
    DvDt: jax.Array,
    bodies: BodiesState,
    row_mask: Optional[jax.Array] = None,
) -> BodiesState:
    """Per-body fluid force/torque from the boundary particles' hydrodynamic
    accelerations (REDUCE_BODIES_FORCES; reference sums rbforces/rbtorques
    per object, `src/GPUSPH.cc:802-830`).

    ``row_mask`` restricts the reduction (multi-device: each shard reduces
    its OWN rows only — ghost copies would double-count — and the per-device
    partials are psum'd, the analogue of the reference's cross-device +
    network body-force reduction, `src/GPUSPH.cc:802-830`)."""
    nb = len(specs)
    obj = object_num(state.info)
    contributes = has_flag(state.info, FG_COMPUTE_FORCE) & has_flag(
        state.info, FG_MOVING_BOUNDARY
    )
    if row_mask is not None:
        contributes = contributes & row_mask
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
    """MOVE_BODIES: prescribed kinematics or Newton-Euler integration with
    body-frame inertia (Euler's equations incl. the gyroscopic term)."""
    linvel = bodies.linvel
    angvel = bodies.angvel
    quat = bodies.quat
    g = jnp.asarray(gravity, jnp.float32)
    for s in specs:
        i = s.object_idx
        if s.floating:
            acc = bodies.force[i] / s.mass + g
            linvel = linvel.at[i].set(linvel[i] + acc * dt)
            # Euler's equations in the principal (body) frame:
            #   I dw/dt = tau_b - w x (I w)
            I = jnp.asarray(s.inertia, jnp.float32)
            q = quat[i]
            w_b = quat_rotate_inv(q, angvel[i])
            tau_b = quat_rotate_inv(q, bodies.torque[i])
            dw_b = (tau_b - jnp.cross(w_b, I * w_b)) / I
            w_b = w_b + dw_b * dt
            angvel = angvel.at[i].set(quat_rotate(q, w_b))
        elif s.motion is not None:
            lv, av = s.motion(t)
            linvel = linvel.at[i].set(jnp.asarray(lv, jnp.float32))
            angvel = angvel.at[i].set(jnp.asarray(av, jnp.float32))
        # bodies without motion stay fixed (feedback-only obstacles)
    cg = bodies.cg + linvel * dt
    # advance orientation by the step's incremental rotation
    dq = quat_from_axis_angle(angvel * dt)
    quat = quat_mul(dq, quat)
    quat = quat / jnp.maximum(jnp.linalg.norm(quat, axis=-1, keepdims=True), 1e-12)
    return bodies.replace(cg=cg, quat=quat, linvel=linvel, angvel=angvel)


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
    (`euler_kernel.def:474-510`): rotate the lever arm about the *pre-step*
    cg by omega*dt, translate by v_cg*dt, set particle velocity to
    v_cg + omega x r.  ``bodies`` is the post-step state (cg already
    advanced by linvel*dt in :func:`step_bodies`), so the pre-step cg is
    recovered as cg - linvel*dt — rotation and translation then compose
    exactly for combined roto-translation."""
    if not specs:
        return state
    obj = object_num(state.info)
    moving = has_flag(state.info, FG_MOVING_BOUNDARY)
    seg = jnp.where(moving, obj, 0)

    cg = bodies.cg[seg]
    lv = bodies.linvel[seg]
    av = bodies.angvel[seg]

    rel = state.pos - (cg - lv * dt)  # lever arm about the pre-step cg
    rel_rot = _axis_angle_rotate(rel, av * dt)
    new_pos = cg + rel_rot
    new_vel = lv + jnp.cross(av, rel_rot)

    m = moving[:, None]
    return state.replace(
        pos=jnp.where(m, new_pos, state.pos),
        vel=jnp.where(m, new_vel, state.vel),
    )


def bodies_to_dict(bodies: Optional[BodiesState]) -> dict:
    """JSON-serializable body state for HotFile checkpoints (the reference
    persists moving-body state in the HotFile, `src/writers/HotFile.h:45-75`)."""
    if bodies is None:
        return {}
    import numpy as np

    return {
        k: np.asarray(getattr(bodies, k)).tolist()
        for k in ("cg", "quat", "linvel", "angvel", "force", "torque")
    }


def bodies_from_dict(d: dict) -> Optional[BodiesState]:
    """Inverse of :func:`bodies_to_dict`; None for an empty dict."""
    if not d:
        return None
    return BodiesState(
        **{k: jnp.asarray(v, jnp.float32) for k, v in d.items()}
    )


__all__ = [
    "BodySpec",
    "BodiesState",
    "bodies_to_dict",
    "bodies_from_dict",
    "init_bodies_state",
    "reduce_body_forces",
    "step_bodies",
    "apply_body_motion",
    "quat_mul",
    "quat_rotate",
    "quat_from_axis_angle",
]

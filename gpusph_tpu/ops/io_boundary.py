"""Open boundaries (inlets / outlets) on SA walls.

TPU-native re-design of the reference's IO machinery
(`saSegmentBoundaryConditionsDevice` / `saVertexBoundaryConditionsDevice`
with on-device particle creation, `boundary_conditions_kernel.cu:2197`,
`engine_boundary_conditions.h:102-150`, theory
`gpusph-theory.tex:798-980`):

* IO wall rows (segments + vertices flagged FG_INLET/FG_OUTLET) get their
  velocity or density *imposed* each boundary-condition pass: VEL_IO rows
  take the problem's imposed velocity and extrapolate density from the
  fluid; PRES_IO rows take the imposed pressure and extrapolate velocity
  (a first-order simplification of the reference's Riemann-invariant
  treatment — see VALIDATION.md).
* fluid particles that cross into the problem's outflow region are
  deactivated (disableOutgoingParts).
* inlet vertex particles accumulate mass from the imposed normal mass flux
  (m_v += rho (u.n) A_v dt); when a vertex exceeds half its reference
  mass, a fluid particle with the reference mass is spawned just inside
  the domain and the vertex mass is decremented (theory eq. around
  `gpusph-theory.tex:951-968`).

Creation runs HOST-side at chunk boundaries (one rebuild period ~= one
particle spacing of inflow travel — the same cadence at which the
reference re-sorts after creating particles); imposition and destruction
run inside the jitted chunk.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..defs import ParticleType
from ..framework import SimFramework
from ..state import (
    FG_CORNER,
    FG_INACTIVE,
    FG_INLET,
    FG_OUTLET,
    FG_VELOCITY_DRIVEN,
    ParticleState,
    has_flag,
    part_type,
)


class IOSpec(NamedTuple):
    """Problem-level open-boundary description (traceable callbacks).

    ``imposed_vel(pos, t) -> [N,3]`` for velocity-driven boundaries;
    ``imposed_press(pos, t[, waterdepth]) -> [N]`` for pressure-driven ones
    (the optional third argument receives :func:`io_water_depth`'s
    ``f32[n_boxes]`` when ``depth_boxes`` is set — the analogue of the
    reference problems' ``IOwaterdepth[object(info)]`` parameter,
    `ChannelIO.cu:149-191`);
    ``outflow(pos) -> bool[N]`` marks the kill region beyond outlets;
    ``depth_boxes`` are static AABBs ((lo),(hi)) — one per open boundary
    that wants the dynamic water-depth reduction (FIND_MAX_IOWATERDEPTH).
    """

    imposed_vel: Optional[Callable] = None
    imposed_press: Optional[Callable] = None
    outflow: Optional[Callable] = None
    depth_boxes: tuple = ()


def io_water_depth(fw: SimFramework, io: IOSpec, state: ParticleState):
    """Max fluid z per open-boundary region (FIND_MAX_IOWATERDEPTH).

    The reference computes, during the forces pass, the max absolute z of
    fluid neighbors of each IO boundary particle, atomically per boundary
    object (`forces_kernel.def:3279-3303`), then maxes across devices and
    nodes (`GPUSPH.cc:2206-2227`).  TPU-native redesign: IO plates are
    static, so each boundary's neighborhood is a static AABB
    (``io.depth_boxes``, built by the problem) expanded by the influence
    radius; the per-object depth is one masked max over the fluid — an
    O(N) fused reduction instead of a pair pass.  Returns ``f32[n_boxes]``
    (−1e30 where no fluid is near; callers treat non-positive depths as
    "no data", like `ChannelIO.cu:186-188`).  In sharded runs the caller
    applies ``lax.pmax`` over the mesh axis (the networkIntReduction
    analogue).
    """
    is_f = part_type(state.info) == ParticleType.FLUID
    act = is_f & state.active
    z = state.pos[:, 2]
    r = fw.influenceradius
    out = []
    for lo, hi in io.depth_boxes:
        inside = act
        for ax in range(3):
            inside = inside & (state.pos[:, ax] >= lo[ax] - r) & (
                state.pos[:, ax] <= hi[ax] + r)
        out.append(jnp.max(jnp.where(inside, z, -1e30)))
    return jnp.stack(out)


def call_imposed_press(io: IOSpec, pos, t, waterdepth):
    """Invoke ``imposed_press`` with or without the water-depth argument,
    by arity (problems predating depth_boxes take (pos, t))."""
    import inspect

    fn = io.imposed_press
    try:
        nparams = len(inspect.signature(fn).parameters)
    except (TypeError, ValueError):
        nparams = 2
    if nparams >= 3 and waterdepth is not None:
        return fn(pos, t, waterdepth)
    return fn(pos, t)


def init_io_mass(fw: SimFramework, state: ParticleState) -> np.ndarray:
    """Initial vertex-mass staggering (initIOmass,
    `boundary_conditions_kernel.cu:2037-2180`).

    The reference redistributes mass between adjacent inlet vertices at
    t=0 — odd-id vertices pull up toward refMass = 0.5·m0 from even-id
    neighbors — so particle creation de-synchronizes instead of every
    vertex spawning on the same step.  Our accumulator lives host-side
    keyed by particle id (``vmass``); the equivalent stagger seeds odd-id
    inlet vertices at +0.25·m0 and even-id ones at −0.25·m0
    (mass-conserving in pairs, same +/− refMass/2 spread as the
    reference's exchange).
    """
    vmass = np.zeros(state.capacity, np.float64)
    info = np.asarray(state.info)
    ids = np.asarray(state.id)
    ptype = info & 7
    inlet_v = (
        (ptype == int(ParticleType.VERTEX))
        & ((info & FG_INLET) > 0)
        & ((info & FG_CORNER) == 0)
    )
    if inlet_v.any():
        m0 = fw.pp.fluids[0].rho0 * fw.sp.deltap ** 3
        sign = np.where(ids[inlet_v] % 2 == 1, 0.25, -0.25)
        vmass[ids[inlet_v]] = sign * m0
    return vmass


def impose_io_values(fw: SimFramework, io: IOSpec, state: ParticleState, t):
    """Impose velocity (VEL_IO) on IO wall rows inside the jitted step.

    Density imposition happens in the SA BC pass (PRES_IO) /
    fluid-extrapolation (VEL_IO); here we pin the wall velocities so the
    SA continuity wall term sees the inflow velocity."""
    info = state.info
    is_wall = (part_type(info) == ParticleType.BOUNDARY) | (
        part_type(info) == ParticleType.VERTEX
    )
    # corner vertices behave like regular (solid) vertices: no imposed
    # values (particleinfo.h:236)
    io_row = is_wall & (has_flag(info, FG_INLET) | has_flag(info, FG_OUTLET)
                        ) & ~has_flag(info, FG_CORNER)
    vel = state.vel
    if io.imposed_vel is not None:
        v_imp = io.imposed_vel(state.pos, t)
        m = io_row & has_flag(info, FG_VELOCITY_DRIVEN)
        vel = jnp.where(m[:, None], v_imp, vel)
    return state.replace(vel=vel)


def kill_outflow(io: IOSpec, state: ParticleState):
    """disableOutgoingParts: deactivate fluid in the outflow region."""
    if io.outflow is None:
        return state
    gone = (
        (part_type(state.info) == ParticleType.FLUID)
        & state.active
        & io.outflow(state.pos)
    )
    info = jnp.where(gone, state.info | jnp.uint32(FG_INACTIVE), state.info)
    return state.replace(info=info)


def belem_np(state):
    return np.asarray(state.extras["belem"])


def inlet_create_host(fw: SimFramework, io: IOSpec, state: ParticleState,
                      vmass: np.ndarray, dt_chunk: float, t: float,
                      next_id: int):
    """Host-side inlet particle creation at a chunk boundary.

    ``vmass`` is the persistent vertex-mass accumulator indexed by particle
    **id** (host numpy; rows are permuted by every rebuild sort — and move
    between devices in sharded runs — so row indexing would leak mass
    between vertices).  Vertex ids are assigned at build time and are
    always < the initial capacity.  Returns (state, vmass, next_id,
    n_created).
    """
    info = np.asarray(state.info)
    pos = np.asarray(state.pos)
    ids = np.asarray(state.id)
    ptype = info & 7
    # corner vertices never generate fluid (particleinfo.h:236)
    inlet_v = (
        (ptype == int(ParticleType.VERTEX))
        & ((info & FG_INLET) > 0)
        & ((info & FG_CORNER) == 0)
    )
    if not inlet_v.any() or io.imposed_vel is None:
        return state, vmass, next_id, 0

    import jax.numpy as jnp  # noqa

    rho0 = fw.pp.fluids[0].rho0
    dp = fw.sp.deltap
    m0 = rho0 * dp**3

    belem = belem_np(state)  # inward normals
    v_imp = np.asarray(io.imposed_vel(state.pos, jnp.float32(t)))
    # vertex area: recovered from the stored vertex mass at fill time
    # (mass = rho0 * volume, volume = area*dp/2 for plates)
    area = np.asarray(state.mass) / (rho0 * dp) * 2.0
    flux = rho0 * np.einsum("ij,ij->i", v_imp, belem) * area  # kg/s inward
    vmass[ids[inlet_v]] += flux[inlet_v] * dt_chunk

    # only inlet-vertex ids index the accumulator (created fluid ids grow
    # past its size)
    acc = np.zeros(len(ids))
    acc[inlet_v] = vmass[ids[inlet_v]]
    spawn = inlet_v & (acc > 0.5 * m0)
    idx = np.nonzero(spawn)[0]
    if len(idx) == 0:
        return state, vmass, next_id, 0

    # clearance guard: never spawn on top of an existing particle --
    # fluid (the inflow void may not have opened yet) or a solid-wall
    # row (inlet-plate EDGE vertices lie on the side-wall planes; their
    # nominal spawn position is embedded in the wall)
    act = np.asarray(state.active)
    io_row = (info & np.uint32(FG_INLET | FG_OUTLET)) > 0
    fl_pos = pos[act & ~io_row]
    cand = pos[idx] + belem_np(state)[idx] * (0.5 * dp)
    if len(fl_pos):
        # vectorized: coarse box prefilter around the inlet region, then one
        # broadcast distance test (no per-candidate Python loop)
        lo = cand.min(axis=0) - 0.8 * dp
        hi = cand.max(axis=0) + 0.8 * dp
        near = np.all((fl_pos >= lo) & (fl_pos <= hi), axis=1)
        fl_near = fl_pos[near]
        if len(fl_near):
            diff = cand[:, None, :] - fl_near[None, :, :]
            d2 = np.einsum("kij,kij->ki", diff, diff)
            idx = idx[d2.min(axis=1) >= (0.7 * dp) ** 2]
    if len(idx) == 0:
        return state, vmass, next_id, 0

    dead = np.nonzero(~np.asarray(state.active))[0]
    n_new = min(len(idx), len(dead))
    if n_new < len(idx):
        idx = idx[:n_new]
    slots = dead[:n_new]

    new_pos = pos[idx] + belem[idx] * (0.5 * dp)
    new_vel = v_imp[idx]
    rho_t = np.asarray(state.rho)[idx]  # wall-imposed density

    posA = np.asarray(state.pos).copy()
    velA = np.asarray(state.vel).copy()
    rhoA = np.asarray(state.rho).copy()
    massA = np.asarray(state.mass).copy()
    infoA = info.copy()
    idA = np.asarray(state.id).copy()
    posA[slots] = new_pos
    velA[slots] = new_vel
    rhoA[slots] = rho_t
    massA[slots] = m0
    infoA[slots] = np.uint32(int(ParticleType.FLUID))
    idA[slots] = next_id + np.arange(n_new, dtype=np.uint32)
    vmass[ids[idx]] -= m0

    # extras rows for the new particles: zero (belem/vr* stay zero)
    extras = {}
    for k, v in state.extras.items():
        a = np.asarray(v).copy()
        a[slots] = 0
        extras[k] = jnp.asarray(a)

    return (
        state.replace(
            pos=jnp.asarray(posA), vel=jnp.asarray(velA),
            rho=jnp.asarray(rhoA), mass=jnp.asarray(massA),
            info=jnp.asarray(infoA), id=jnp.asarray(idA), extras=extras,
        ),
        vmass,
        next_id + n_new,
        n_new,
    )


__all__ = [
    "IOSpec",
    "impose_io_values",
    "kill_outflow",
    "inlet_create_host",
    "io_water_depth",
    "call_imposed_press",
    "init_io_mass",
]

"""Particle state: a struct-of-arrays pytree with fixed capacity.

TPU-native replacement for the reference's buffer system (`src/buffer.h`,
`src/define_buffers.h:48-357`, `src/ParticleSystem.h:61-282`).  Where the
reference manages a pool of named device buffers with validity states and
double-buffering ("step n" / "step n*" states), the TPU build's state is a
pure-functional pytree: the integrator maps ``State -> State`` and XLA decides
buffer reuse — the whole buffer-state machine becomes vacuous.

Capacity is *static* (padded).  Dead slots carry ``ParticleType.NONE`` and are
masked out of every interaction; open-boundary particle creation/destruction
reuses dead slots (the analogue of the reference's on-device particle
generation at open boundaries, `src/cuda/boundary_conditions_kernel.cu`).

``info`` packs type/flags/fluid-or-object number into a uint32, mirroring the
reference's ``particleinfo`` ushort4 (`src/particleinfo.h:79-160`):

* bits 0-2   particle type (ParticleType)
* bits 3-15  flags (FG_*)
* bits 16-23 fluid number (fluid particles) or object number (body particles)
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from .defs import ParticleType

# --- info bit layout -------------------------------------------------------

TYPE_BITS = 3
TYPE_MASK = (1 << TYPE_BITS) - 1

# flags (reference `src/particleinfo.h:150-160`)
FG_COMPUTE_FORCE = 1 << 3  # particle contributes to rigid-body force feedback
FG_MOVING_BOUNDARY = 1 << 4  # particle belongs to a moving/floating body
FG_INLET = 1 << 5
FG_OUTLET = 1 << 6
FG_VELOCITY_DRIVEN = 1 << 7  # open boundary with imposed velocity (else pressure)
FG_CORNER = 1 << 8  # corner vertex at open boundaries
FG_SURFACE = 1 << 9  # free-surface particle (set by post-processing)
FG_SEDIMENT = 1 << 10  # granular sediment particle
FG_INACTIVE = 1 << 11  # disabled particle (kept for id continuity)
FG_INTERFACE = 1 << 12  # sediment/phase interface particle (post-processing)

FLUID_NUM_SHIFT = 16
FLUID_NUM_MASK = 0xFF

# open-boundary object number (bits 24-31): which open boundary an IO
# segment/vertex belongs to — the reference keeps it in particleinfo's
# object field; here fluid/object shares bits 16-23, so IO rows carry
# their boundary id separately (used by the IO water-depth reduction,
# forces_kernel.def:3302, GPUSPH.cc:2206)
IO_OBJ_SHIFT = 24
IO_OBJ_MASK = 0xFF


def io_object_num(info):
    return ((info >> IO_OBJ_SHIFT) & IO_OBJ_MASK).astype(jnp.int32)


def make_info(ptype, flags=0, fluid_or_object=0):
    """Pack particle type, flags and fluid/object number into a uint32."""
    return jnp.uint32(
        (jnp.uint32(ptype) & TYPE_MASK)
        | jnp.uint32(flags)
        | ((jnp.uint32(fluid_or_object) & FLUID_NUM_MASK) << FLUID_NUM_SHIFT)
    )


def part_type(info):
    return (info & TYPE_MASK).astype(jnp.int32)


def fluid_num(info):
    return ((info >> FLUID_NUM_SHIFT) & FLUID_NUM_MASK).astype(jnp.int32)


object_num = fluid_num  # same field, reference `src/particleinfo.h` object()


def has_flag(info, flag):
    return (info & jnp.uint32(flag)) != 0


def is_fluid(info):
    return part_type(info) == ParticleType.FLUID


def is_boundary(info):
    return part_type(info) == ParticleType.BOUNDARY


def is_vertex(info):
    return part_type(info) == ParticleType.VERTEX


def is_active(info):
    """A slot takes part in the simulation: real type and not disabled."""
    return (part_type(info) != ParticleType.NONE) & ~has_flag(info, FG_INACTIVE)


class ParticleState(struct.PyTreeNode):
    """Fixed-capacity struct-of-arrays particle state.

    Core fields mirror the reference's POS/VEL/INFO/ID buffers
    (`src/define_buffers.h`); the density convention is the relative density
    ``rho_tilde = rho/rho0 - 1`` stored separately from ``vel`` (the reference
    packs it in ``vel.w``).  ``extras`` holds model-dependent per-particle
    fields (k-epsilon ``tke/epsilon``, Grenier ``volume/sigma``, SA
    ``gradgamma``, internal ``energy``, granular ``effpres`` ...), keyed by
    the buffer names of the reference's catalog.
    """

    pos: jax.Array  # f32[N,3] positions (global coordinates)
    vel: jax.Array  # f32[N,3]
    rho: jax.Array  # f32[N] relative density rho/rho0 - 1
    mass: jax.Array  # f32[N]
    info: jax.Array  # u32[N] packed type/flags/fluid-object
    id: jax.Array  # u32[N] persistent particle id
    extras: Dict[str, jax.Array] = struct.field(default_factory=dict)

    @property
    def capacity(self) -> int:
        return self.pos.shape[0]

    @property
    def active(self):
        return is_active(self.info)

    def count_active(self):
        return jnp.sum(self.active.astype(jnp.int32))

    def extra(self, name: str) -> Optional[jax.Array]:
        return self.extras.get(name)


def empty_state(capacity: int, extras: Dict[str, jax.Array] | None = None) -> ParticleState:
    """All-dead state of the given capacity."""
    return ParticleState(
        pos=jnp.zeros((capacity, 3), jnp.float32),
        vel=jnp.zeros((capacity, 3), jnp.float32),
        rho=jnp.zeros((capacity,), jnp.float32),
        mass=jnp.zeros((capacity,), jnp.float32),
        info=jnp.full((capacity,), int(ParticleType.NONE), jnp.uint32),
        id=jnp.arange(capacity, dtype=jnp.uint32),
        extras=dict(extras or {}),
    )


def concat_states(states, capacity: int) -> ParticleState:
    """Concatenate particle sets and pad to ``capacity`` dead slots."""
    n = sum(int(s.pos.shape[0]) for s in states)
    if n > capacity:
        raise ValueError(f"states hold {n} particles > capacity {capacity}")
    pad = empty_state(capacity - n)

    def cat(*xs):
        return jnp.concatenate(xs, axis=0)

    parts = list(states) + [pad]
    out = jax.tree.map(cat, *parts)
    # reassign unique ids
    return out.replace(id=jnp.arange(capacity, dtype=jnp.uint32))


__all__ = [
    "ParticleState",
    "empty_state",
    "concat_states",
    "make_info",
    "part_type",
    "fluid_num",
    "object_num",
    "has_flag",
    "is_fluid",
    "is_boundary",
    "is_vertex",
    "is_active",
    "FG_COMPUTE_FORCE",
    "FG_MOVING_BOUNDARY",
    "FG_INLET",
    "FG_OUTLET",
    "FG_VELOCITY_DRIVEN",
    "FG_CORNER",
    "FG_SURFACE",
    "FG_SEDIMENT",
    "FG_INACTIVE",
    "FG_INTERFACE",
]

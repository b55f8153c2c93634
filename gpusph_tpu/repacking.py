"""Particle repacking: pre-simulation relaxation of the initial lattice.

TPU-native equivalent of the reference's RepackingIntegrator
(`src/integrators/RepackingIntegrator.cc:279-425`) and the repack kernels
(`repackDevice` `src/cuda/forces_kernel.def:4161`, damping term `:4310`).

The mixing force is F = -a c0^2 grad(Gamma) with
grad(Gamma) = sum_j V_j grad W_ij, plus a velocity damping term
alpha * c0/dp * v.  Particles relax under this pseudo-dynamics for
``repack_maxiter`` iterations (or until kinetic energy stalls), after which
velocities are zeroed and the simulation proper starts from the repacked
positions (`--repack`, `src/main.cc:238-250`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .defs import ParticleType
from .framework import SimFramework
from .ops import eos
from .ops.kernels import F as kernF
from .ops.neighbors import CellGrid, build_cells
from .ops.pair import neighbor_apply, merge_vec, split_vec
from .state import ParticleState, fluid_num, part_type


def repack_forces(fw: SimFramework, grid: CellGrid, state: ParticleState, aux):
    """Mixing + damping pseudo-forces (repackDevice)."""
    sp, pp = fw.sp, fw.pp
    h = sp.slength
    f_num = fluid_num(state.info)
    rho_phys = eos.physical_density(pp, state.rho, f_num)
    c0 = eos._per_fluid(pp, f_num, [f.c0 for f in pp.fluids])

    fields = dict(
        **split_vec("pos", state.pos),
        mass=state.mass,
        rho=rho_phys,
        c0=c0,
        ptype=part_type(state.info),
    )

    def pair_fn(c, n, g):
        f = kernF(fw.kerneltype, g.r, h)
        c_fluid = c["ptype"] == ParticleType.FLUID
        # fluid centrals vs all (fluid + boundary) neighbors
        coeff = jnp.where(
            g.mask & c_fluid,
            -sp.repack_a * c["c0"] * c["c0"] * n["mass"] / n["rho"] * f,
            0.0,
        )
        return {
            "DvDt_x": coeff * g.relx,
            "DvDt_y": coeff * g.rely,
            "DvDt_z": coeff * g.relz,
        }

    sums = neighbor_apply(
        grid, aux, fields, pair_fn,
        max_parts_per_cell=sp.max_parts_per_cell,
        influenceradius=sp.influenceradius,
    )
    DvDt = merge_vec(sums, "DvDt")
    # damping (forces_kernel.def:4310)
    DvDt = DvDt - (sp.repack_alpha * c0 / sp.deltap)[:, None] * state.vel
    is_fluid = part_type(state.info) == ParticleType.FLUID
    return jnp.where(is_fluid[:, None], DvDt, 0.0)


def make_repack_chunk(fw: SimFramework, grid: CellGrid, nsteps: int = 10):
    c0max = max(f.c0 for f in fw.pp.fluids)
    dt = 0.1 * fw.sp.slength / c0max

    def step(state, _):
        _, aux = None, None
        return state, None

    def chunk(state: ParticleState):
        state, aux = build_cells(grid, state)

        def body(st, _):
            dv = repack_forces(fw, grid, st, aux)
            is_fluid = (part_type(st.info) == ParticleType.FLUID)[:, None]
            vel = jnp.where(is_fluid, st.vel + dv * dt, 0.0)
            pos = jnp.where(is_fluid, st.pos + vel * dt, st.pos)
            return st.replace(pos=pos, vel=vel), None

        state, _ = jax.lax.scan(body, state, None, length=nsteps)
        return state

    return jax.jit(chunk, donate_argnums=(0,))


def run_repacking(sim, state: ParticleState) -> ParticleState:
    """Run the repacking loop then zero velocities (FINISH_REPACKING)."""
    fw, grid = sim.fw, sim.grid
    nsteps = 10
    chunk = make_repack_chunk(fw, grid, nsteps)
    iters = 0
    while iters < fw.sp.repack_maxiter:
        state = chunk(state)
        iters += nsteps
    # END_OF_REPACKING: zero velocities, keep positions
    return state.replace(vel=jnp.zeros_like(state.vel))


__all__ = ["run_repacking", "repack_forces", "make_repack_chunk"]

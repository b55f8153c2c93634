"""Integration engine: the Euler update of the predictor-corrector scheme.

TPU-native equivalent of ``eulerDevice`` (`src/cuda/euler_kernel.def:395-540`)
and the corrected-velocity logic (`compute_corrected_velocity`, same file).

Scheme (reference `src/integrators/PredictorCorrectorIntegrator.cc:44-69`):

* predictor (step 1): from state n with forces(n), dt_eff = dt/2,
  ``velc = vel(n)`` — produces state n*
* corrector (step 2): from state n with forces(n*), dt_eff = dt,
  ``velc = vel(n) + forces(n*) * dt/2`` — produces state n+1

Both steps read the *same* base state n; only the forces differ.  With XSPH
the mean-velocity correction is added to ``velc``.

Type behavior (euler_kernel.def:416-520): fluid particles integrate
pos/vel/rho; boundary particles are static except: DYN boundaries integrate
density; moving-body particles follow the rigid-body motion (handled by the
bodies subsystem, which rewrites their pos/vel afterwards).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..defs import BoundaryType, ParticleType, SimFlags, SPHFormulation
from ..framework import SimFramework
from ..state import ParticleState, part_type
from .forces import ForcesOut


def wrap_periodic(grid, pos):
    """Wrap positions into the periodic box (the reference folds this into
    the cell hash, `buildneibs_kernel.cu:664`; we keep positions canonical
    instead so cell assignment stays consistent)."""
    per = int(grid.periodic)
    if not per:
        return pos
    origin = grid.origin
    size = grid.world_size
    cols = []
    for a in range(3):
        x = pos[:, a]
        if per & (1 << a):
            x = origin[a] + jnp.mod(x - origin[a], size[a])
        cols.append(x)
    return jnp.stack(cols, axis=1)


def euler_step(
    fw: SimFramework,
    state_n: ParticleState,
    forces: ForcesOut,
    dt_eff,
    *,
    step: int,
    full_dt=None,
    grid=None,
) -> ParticleState:
    """One Euler update producing state n* (step=1) or n+1 (step=2)."""
    ptype = part_type(state_n.info)
    is_fluid = ptype == ParticleType.FLUID
    is_bound = ptype == ParticleType.BOUNDARY

    dt_eff = jnp.asarray(dt_eff, jnp.float32)

    # corrected velocity (compute_corrected_velocity, euler_kernel.def)
    velc = state_n.vel
    if step == 2:
        half = jnp.asarray(full_dt, jnp.float32) * 0.5
        velc = velc + forces.DvDt * half
    if fw.has_xsph:
        velc = velc + fw.pp.epsxsph * forces.xsph

    new_pos = jnp.where(
        is_fluid[:, None], state_n.pos + velc * dt_eff, state_n.pos
    )
    if grid is not None:
        new_pos = wrap_periodic(grid, new_pos)
    new_vel = jnp.where(
        is_fluid[:, None], state_n.vel + forces.DvDt * dt_eff, state_n.vel
    )

    rho_mask = is_fluid
    if fw.boundarytype in (BoundaryType.DYN_BOUNDARY, BoundaryType.SA_BOUNDARY):
        rho_mask = rho_mask | is_bound

    extras = dict(state_n.extras)
    if fw.sph_formulation == SPHFormulation.SPH_GRENIER:
        # Grenier: forces.DrDt is DJ/Dt; euler evolves the log-volume J
        # (euler_kernel.def continuity_integration GRENIER + write_volume:
        # vol.y += dt*force.w, vol.w = exp(vol.y)*vol.x).  The density itself
        # is refreshed by the COMPUTE_DENSITY pass before each forces call.
        extras["grenier_J"] = jnp.where(
            rho_mask,
            state_n.extras["grenier_J"] + forces.DrDt * dt_eff,
            state_n.extras["grenier_J"],
        )
        new_rho = state_n.rho
    else:
        new_rho = jnp.where(
            rho_mask, state_n.rho + forces.DrDt * dt_eff, state_n.rho
        )
    # internal energy integration (euler_kernel.def:182-196)
    if (fw.flags & SimFlags.ENABLE_INTERNAL_ENERGY) and "energy" in extras:
        extras["energy"] = jnp.where(
            is_fluid, extras["energy"] + forces.DEDt * dt_eff, extras["energy"]
        )

    # k-epsilon implicit update + eddy viscosity (integrate_k_e,
    # euler_kernel.def:219-230, turbvisc write :335 — written with the
    # standard C_mu = 0.09, matching the model constants used everywhere
    # else; the reference's 0.9 literal there appears to be a typo)
    from ..defs import TurbulenceModel

    if fw.visc.turbmodel == TurbulenceModel.KEPSILON:
        oldK = jnp.maximum(extras["tke"], 1e-10)
        oldE = jnp.maximum(extras["eps"], 1e-10)
        dk = forces.dkde[:, 0]
        de = forces.dkde[:, 1]
        ce2 = forces.dkde[:, 2]
        newK = (oldK + dt_eff * dk) / (1.0 + dt_eff * oldE / oldK)
        newE = (oldE + dt_eff * de) / (1.0 + dt_eff * oldE / oldK * ce2)
        newK = jnp.maximum(newK, 1e-10)
        newE = jnp.maximum(newE, 1e-10)
        extras["tke"] = jnp.where(is_fluid, newK, extras["tke"])
        extras["eps"] = jnp.where(is_fluid, newE, extras["eps"])
        extras["turbvisc"] = jnp.where(
            is_fluid, 0.09 * newK * newK / newE, extras["turbvisc"]
        )

    return state_n.replace(pos=new_pos, vel=new_vel, rho=new_rho, extras=extras)


def compute_dt(fw: SimFramework, forces: ForcesOut):
    """Adaptive dt from the CFL maxima — ``dtreduce`` (`forces.cu:557-600`).

    dt = dtadaptfactor * min( sqrt(h/max|a|), h/max_c ), further bounded by
    the viscous condition viscdtfactor * h^2 / nu_max.
    """
    sp = fw.sp
    h = jnp.float32(sp.slength)
    dt_force = jnp.sqrt(h / jnp.maximum(forces.max_accel, 1e-12))
    dt_sound = h / jnp.maximum(forces.max_sspeed, 1e-12)
    dt = sp.dtadaptfactor * jnp.minimum(dt_force, dt_sound)
    if not fw.is_inviscid:
        # the reference uses 0.125 h^2/nu ("TODO allow customization",
        # forces.cu:596-597); the measured stability threshold of the
        # explicit Morris operator under the predictor-corrector is
        # ~0.06 h^2/nu (BiFluidPoiseuille, VALIDATION.md), so the default
        # here is tighter and problem-adjustable via SimParams
        dt_visc = sp.viscdtfactor * h * h / jnp.maximum(
            forces.max_kinvisc, 1e-12)
        dt = jnp.minimum(dt, dt_visc)
    return dt


__all__ = ["euler_step", "compute_dt"]

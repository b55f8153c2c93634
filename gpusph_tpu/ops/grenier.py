"""Grenier's multi-fluid sigma/volume formulation: density & sigma pass.

TPU-native counterpart of the reference's COMPUTE_DENSITY phase for
SPH_GRENIER (`densityGrenierDevice` `src/cuda/forces_kernel.cu:286-350`):

* sigma_a = W(0) + sum_b W_ab  (number density over ALL neighbor types
  processed — fluid, plus boundary with DYN boundaries)
* smoothed density rho_a = (m_a W(0) + sum_{b same fluid/type} m_b W_ab) /
  ((W(0) + sum_{b same} W_ab) * omega_a)
  with omega_a = exp(J_a) * V0_a the particle's actual volume (J evolved by
  the continuity equation, euler_kernel.def:213-216).

The forces engine then uses sigma-weighted operators (see ops/forces.py
GRENIER branches; reference `forces_kernel.def:2016-2028, 2387-2392,
2580-2586, 3180-3190`).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..defs import BoundaryType, ParticleType
from ..framework import SimFramework
from ..state import ParticleState, fluid_num, part_type
from . import eos
from .kernels import W as kernW
from .neighbors import CellAux, CellGrid
from .pair import neighbor_apply, split_vec


def grenier_volume(state: ParticleState):
    """Actual particle volume omega = exp(J) * V0."""
    return jnp.exp(state.extras["grenier_J"]) * state.extras["grenier_vol0"]


def grenier_density_sigma(fw: SimFramework, grid: CellGrid,
                          state: ParticleState, aux: CellAux,
                          *, chunk_cells: int = 256):
    """Returns (sigma [N], rho_tilde [N]) for the current configuration."""
    sp = fw.sp
    h = sp.slength
    vol = grenier_volume(state)
    fields = dict(
        **split_vec("pos", state.pos),
        mass=state.mass,
        ptype=part_type(state.info),
        f_num=fluid_num(state.info),
    )
    dyn = fw.boundarytype == BoundaryType.DYN_BOUNDARY

    def pair_fn(c, n, g):
        n_fluid = n["ptype"] == ParticleType.FLUID
        n_ok = n_fluid | ((n["ptype"] == ParticleType.BOUNDARY) if dyn else False)
        w = kernW(fw.kerneltype, g.r, h)
        sig = jnp.where(g.mask & n_ok, w, 0.0)
        # smoothed mass: same type AND same fluid (forces_kernel.cu:330-340)
        same = (c["f_num"] == n["f_num"]) & (
            (c["ptype"] == n["ptype"]) if dyn else True
        )
        wm = jnp.where(g.mask & n_ok & same, w, 0.0)
        return {
            "sigma": sig,
            "corr": wm,
            "mass_corr": wm * n["mass"],
        }

    sums = neighbor_apply(
        grid, aux, fields, pair_fn,
        max_parts_per_cell=sp.max_parts_per_cell,
        influenceradius=sp.influenceradius,
        chunk_cells=chunk_cells,
    )
    w0 = kernW(fw.kerneltype, jnp.zeros(()), h)
    sigma = sums["sigma"] + w0
    corr = sums["corr"] + w0
    mass_corr = sums["mass_corr"] + state.mass * w0

    rho_phys = mass_corr / (corr * jnp.maximum(vol, 1e-30))
    f_num = fluid_num(state.info)
    rho_tilde = eos.numerical_density(fw.pp, rho_phys, f_num)

    # only fluid (and DYN boundary) particles get the smoothed density
    ptype = part_type(state.info)
    upd = ptype == ParticleType.FLUID
    if dyn:
        upd = upd | (ptype == ParticleType.BOUNDARY)
    rho_tilde = jnp.where(upd, rho_tilde, state.rho)
    return sigma, rho_tilde


__all__ = ["grenier_density_sigma", "grenier_volume"]

"""Viscosity engine: shear rate, SPS stress, non-Newtonian effective viscosity.

TPU-native counterpart of the reference's viscosity engine
(`AbstractViscEngine` `src/engine_visc.h:45-100`, kernels in
`src/cuda/visc_kernel.cu`):

* shear-rate tensor via SPH velocity gradients
  (`shearRate<MIXED_TENSOR>` `visc_kernel.cu:300-350`:
  dv_a = - sum m_j/rho_j v_ab,a grad W)
* SPS sub-particle-scale stress (`SPSstressMatrixDevice`
  `visc_kernel.cu:760-810`): Smagorinsky nu_sps = (Cs dp)^2 |S|,
  Dalrymple & Rogers (2006) eq. 10/12, tau stored per particle
* effective viscosity for generalized-Newtonian rheologies
  (`effectiveViscDevice` `visc_kernel.cu:640-700`):
  viscShearTerm + viscYieldTerm with Papanastasiou regularization
  (`:440-540`), clamped to the limiting viscosity

The "mixed tensor" convention matches the reference: diagonal entries hold
dv_a/da, off-diagonals hold the DOUBLED symmetric part (dv_a/db + dv_b/da).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..defs import ParticleType, RheologyType, ComputationalViscosityType
from ..framework import SimFramework
from ..state import FG_SEDIMENT, ParticleState, fluid_num, has_flag, part_type
from . import eos
from .kernels import F as kernF
from .neighbors import CellAux, CellGrid
from .pair import neighbor_apply, split_vec

# component order of the 6-vector mixed tensor
XX, XY, XZ, YY, YZ, ZZ = range(6)


def shear_rate_tensor(fw: SimFramework, grid: CellGrid, state: ParticleState,
                      aux: CellAux, *, chunk_cells: int = 256):
    """Mixed shear-rate tensor [N,6] (shearRate<MIXED_TENSOR>)."""
    sp = fw.sp
    h = sp.slength
    f_num = fluid_num(state.info)
    fields = dict(
        **split_vec("pos", state.pos),
        **split_vec("vel", state.vel),
        mass=state.mass,
        rho=eos.physical_density(fw.pp, state.rho, f_num),
        ptype=part_type(state.info),
    )

    def pair_fn(c, n, g):
        ok = g.mask
        f = kernF(fw.kerneltype, g.r, h)
        coeff = jnp.where(ok, n["mass"] / n["rho"] * f, 0.0)
        # dv_a/db = - sum m_j/rho_j (v_a,i - v_a,j) * rel_b * F
        rvx = c["vel_x"] - n["vel_x"]
        rvy = c["vel_y"] - n["vel_y"]
        rvz = c["vel_z"] - n["vel_z"]
        return {
            "dxx": -coeff * rvx * g.relx,
            "dxy": -coeff * rvx * g.rely,
            "dxz": -coeff * rvx * g.relz,
            "dyx": -coeff * rvy * g.relx,
            "dyy": -coeff * rvy * g.rely,
            "dyz": -coeff * rvy * g.relz,
            "dzx": -coeff * rvz * g.relx,
            "dzy": -coeff * rvz * g.rely,
            "dzz": -coeff * rvz * g.relz,
        }

    s = neighbor_apply(
        grid, aux, fields, pair_fn,
        max_parts_per_cell=sp.max_parts_per_cell,
        influenceradius=sp.influenceradius,
        chunk_cells=chunk_cells,
    )
    return jnp.stack(
        [
            s["dxx"],
            s["dxy"] + s["dyx"],
            s["dxz"] + s["dzx"],
            s["dyy"],
            s["dyz"] + s["dzy"],
            s["dzz"],
        ],
        axis=-1,
    )


def shear_rate_norm2(tau):
    """2*S:S of a mixed tensor (shearRateNorm2<MIXED_TENSOR>)."""
    return (
        2.0 * (tau[..., XX] ** 2 + tau[..., YY] ** 2 + tau[..., ZZ] ** 2)
        + tau[..., XY] ** 2
        + tau[..., XZ] ** 2
        + tau[..., YZ] ** 2
    )


def sps_stress(fw: SimFramework, grid: CellGrid, state: ParticleState,
               aux: CellAux, *, chunk_cells: int = 256):
    """SPS tau [N,6] (stored /rho like the reference) + turbulent nu [N]."""
    pp = fw.pp
    tau = shear_rate_tensor(fw, grid, state, aux, chunk_cells=chunk_cells)
    SijSij_bytwo = shear_rate_norm2(tau)
    S = jnp.sqrt(SijSij_bytwo)
    nu_sps = pp.smagfactor * S  # Dalrymple & Rogers (2006) eq. 12
    divu = (2.0 / 3.0) * nu_sps * (tau[..., XX] + tau[..., YY] + tau[..., ZZ])
    bline = pp.kspsfactor * SijSij_bytwo

    f_num = fluid_num(state.info)
    rho = eos.physical_density(pp, state.rho, f_num)
    out = jnp.stack(
        [
            (2.0 * nu_sps * tau[..., XX] - divu - bline) / rho,
            nu_sps * tau[..., XY] / rho,
            nu_sps * tau[..., XZ] / rho,
            (2.0 * nu_sps * tau[..., YY] - divu - bline) / rho,
            nu_sps * tau[..., YZ] / rho,
            (2.0 * nu_sps * tau[..., ZZ] - divu - bline) / rho,
        ],
        axis=-1,
    )
    return out, nu_sps


def effective_viscosity(fw: SimFramework, grid: CellGrid, state: ParticleState,
                        aux: CellAux, *, effpres=None, chunk_cells: int = 256):
    """Per-particle effective KINEMATIC viscosity for shear-dependent
    rheologies (effectiveViscDevice).  ``effpres`` feeds the granular yield
    stress (Jacobi solver output)."""
    pp = fw.pp
    rt = fw.visc.rheologytype
    f_num = fluid_num(state.info)
    rho = eos.physical_density(pp, state.rho, f_num)

    tau = shear_rate_tensor(fw, grid, state, aux, chunk_cells=chunk_cells)
    shrate = jnp.sqrt(shear_rate_norm2(tau))
    shrate = jnp.maximum(shrate, 1e-10)

    # the stored visccoeff is the consistency index (dynamic units) for
    # generalized-Newtonian rheologies (GPUSPH.cc:1480-1510)
    consistency = eos._per_fluid(
        pp, f_num, [f.kinematic_visc * f.rho0 for f in pp.fluids]
    )
    nonlin = eos._per_fluid(pp, f_num, [f.visc_nonlinear_param for f in pp.fluids])
    ys = eos._per_fluid(pp, f_num, [f.yield_strength for f in pp.fluids])
    regm = eos._per_fluid(
        pp, f_num, [f.visc_regularization_param for f in pp.fluids]
    )

    # shear term (visc_kernel.cu:500-540)
    if rt in (RheologyType.POWER_LAW, RheologyType.HERSCHEL_BULKLEY,
              RheologyType.ALEXANDROU):
        shear_term = consistency * jnp.power(shrate, nonlin - 1.0)
    elif rt in (RheologyType.DEKEE_TURCOTTE, RheologyType.ZHU):
        shear_term = consistency * jnp.exp(-nonlin * shrate)
    elif rt == RheologyType.GRANULAR:
        sinpsi = eos._per_fluid(pp, f_num, [f.sinpsi for f in pp.fluids])
        if effpres is None:
            effpres = jnp.zeros(state.capacity, jnp.float32)
        tau_y = (
            2.0 * jnp.sqrt(3.0) * sinpsi / (3.0 - sinpsi) * effpres
        )
        sediment = has_flag(state.info, FG_SEDIMENT)
        shear_term = jnp.where(sediment, tau_y / shrate, consistency)
    else:  # BINGHAM / PAPANASTASIOU: linear
        shear_term = consistency

    # yield term (visc_kernel.cu:455-500)
    if rt in (RheologyType.BINGHAM, RheologyType.HERSCHEL_BULKLEY):
        yield_term = ys / shrate
    elif rt in (RheologyType.PAPANASTASIOU, RheologyType.ALEXANDROU,
                RheologyType.DEKEE_TURCOTTE, RheologyType.ZHU):
        # regularized: ys * (1 - exp(-m*shrate))/shrate, -> ys*m as shrate->0
        mx = regm * shrate
        reg = jnp.where(
            mx < 1e-4, regm * (1.0 - 0.5 * mx), (1.0 - jnp.exp(-mx)) / shrate
        )
        yield_term = ys * reg
    else:
        yield_term = jnp.zeros_like(shrate)

    effvisc_dyn = shear_term + yield_term
    rho0 = eos._per_fluid(pp, f_num, [f.rho0 for f in pp.fluids])
    limit = pp.limiting_kinvisc * rho0
    if rt == RheologyType.GRANULAR:
        effvisc_dyn = jnp.clip(effvisc_dyn, consistency, limit)
    else:
        effvisc_dyn = jnp.minimum(effvisc_dyn, limit)

    # the forces engine consumes the KINEMATIC effective viscosity
    return effvisc_dyn / rho


__all__ = [
    "shear_rate_tensor",
    "shear_rate_norm2",
    "sps_stress",
    "effective_viscosity",
]
